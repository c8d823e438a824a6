from .mesh import agent_mesh, shard_agents
