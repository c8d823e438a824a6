"""STS — SLAM-specific task scheduling.

Reference spec: MediatorScheduler (/root/reference/code/src/MediatorScheduler.cc)
— singleton priority-queue scheduler with three virtual queues
(comparator :19-42):
  0. lost handling      — agents whose tracking is unstable/lost
  1. lost prevention    — velocity burst or nTracked < 20
  2. map enrichment     — by MBP contribution score
ProcessRequest (:97-128): ReceivePush -> global overlap check -> Rank ->
MBP virtual keyframe -> Compress -> GlobalBundleAdjustment(10) ->
MapDistribute.
"""
from __future__ import annotations

import heapq
import itertools
import threading
from typing import Callable

from ..sync import codec
from ..sync.oplog import MapSlice
from ..utils.logging import get_logger
from .map_manager import MapManager
from .mediator import AgentMediator

_log = get_logger("scheduler")

LOW_TRACKED_TH = 20  # reference comparator: nTracked < 20 => lost prevention


class MediatorScheduler:
    """The server's single processing queue over all agents' pushes."""

    def __init__(self, map_manager: MapManager | None = None,
                 distribute_fn: Callable[[int, bytes], None] | None = None,
                 gba_iters: int = 10, background_gba: bool = False):
        self.map_manager = map_manager or MapManager()
        self.mediators: dict[int, AgentMediator] = {}
        self.distribute_fn = distribute_fn  # (agent_id, payload) -> None
        self.gba_iters = gba_iters
        # background_gba: run GBA on a detached per-agent thread the way
        # the reference does (LoopClosing.cc:602 RunGlobalBundleAdjustment
        # std::thread + mbStopGBA) so the scheduler keeps draining pushes
        # during the optimization.  Off by default: the synchronous path
        # is deterministic (combined-mode tests gate on it).
        self.background_gba = background_gba
        self._heap: list = []
        # per-agent FIFO under the STS heap: priorities order WHICH AGENT
        # is served next, but one agent's slices must apply in push order
        # — the op-log protocol is sequential per stream (an out-of-order
        # newer slice would regress poses and build partial replicas that
        # loop closing then corrects against)
        self._fifo: dict[int, object] = {}
        self._seq = itertools.count()
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._worker: threading.Thread | None = None
        self._stop = False
        self.processed = 0
        self._gba_threads: dict[int, threading.Thread] = {}
        self._gba_abort: dict[int, threading.Event] = {}

    def register_mediator(self, med: AgentMediator):
        self.mediators[med.map_id] = med

    # ------------------------------------------------------------------ enqueue
    def _priority(self, med: AgentMediator, sl: MapSlice) -> tuple:
        """Smaller sorts first: (queue_class, -contribution, seq)."""
        state = med.state
        if state is not None and not state.stable:
            qclass = 0                      # lost handling
        elif state is not None and (state.velocity_burst
                                    or state.n_tracked < LOW_TRACKED_TH):
            qclass = 1                      # lost prevention
        else:
            qclass = 2                      # map enrichment
        contrib = med.scoring.request_priority(len(sl.kfs) + len(sl.mps))
        return (qclass, -contrib, next(self._seq))

    def enqueue_request(self, agent_id: int, payload: bytes):
        med = self.mediators.get(agent_id)
        if med is None:
            _log.warning("push from unknown agent %d", agent_id)
            return
        sl = codec.decode_slice(payload)
        prio = self._priority(med, sl)
        from collections import deque

        with self._cv:
            self._fifo.setdefault(agent_id, deque()).append(sl)
            heapq.heappush(self._heap, (prio, agent_id))
            self._cv.notify()

    def report_state(self, agent_id: int, state):
        med = self.mediators.get(agent_id)
        if med is not None:
            med.set_state(state)

    def reply_pull(self, agent_id: int) -> bytes | None:
        """Client pull: encode the latest-5-keyframe slice of the server
        replica (reference: Mapit::ReplyPull, src/Mapit.cc:164-196)."""
        med = self.mediators.get(agent_id)
        if med is None:
            _log.warning("pull from unknown agent %d", agent_id)
            return None
        return codec.encode_slice(med.mapit.reply_pull())

    # ------------------------------------------------------------------ process
    def process_request(self, agent_id: int, sl: MapSlice):
        """One full server pass (reference: ProcessRequest)."""
        med = self.mediators[agent_id]
        if self.background_gba:
            # a fresh push supersedes the in-flight GBA for this agent
            # (mbStopGBA): signal it; its apply-under-lock will discard
            ev = self._gba_abort.get(agent_id)
            if ev is not None:
                ev.set()
        from ..utils.stats import STATS

        with med.store.lock:  # serialize against background GBA apply
            with STATS.stage("srv_on_push"):
                new_kfs = med.on_push(sl)                   # ReceivePush
            with STATS.stage("srv_overlap"):
                med.check_overlap_candidates(new_kfs)       # global overlap
            with STATS.stage("srv_rank"):
                med.scoring.rank()                          # MBP Rank
            with STATS.stage("srv_vkf"):
                vk = med.enhancer.get_virtual_keyframe(new_kfs)  # MBP virtual KF
                if vk is not None and med.kfdb is not None:
                    med.kfdb.add(med.store, vk)
                med.enhancer.compress()                     # MBP compress
        if len(new_kfs) > 0:
            if self.background_gba:
                self._launch_gba(agent_id)
            else:
                # the reference's scheduler GBA runs to COMPLETION per
                # push (MediatorScheduler.cc:121-122 — its stopGBA is a
                # local that nothing sets).  Through the tunnel a full
                # 10-iteration pass per push is too slow, and a hard
                # newer-push abort starves GBA entirely at 5-agent push
                # rates (a push is ALWAYS pending -> 0 iterations ever,
                # and post-fuse / post-loop warps never get polished
                # out).  Soft abort = both: a newer pending push caps the
                # pass between LM chunks, but completed chunks APPLY, so
                # every push still buys forward GBA progress.
                def newer_pending():
                    with self._lock:
                        return bool(self._fifo.get(agent_id))

                med.loop_closing.global_ba(self.gba_iters,
                                           should_abort=newer_pending,
                                           soft_abort=True)  # GBA(10)
        self.map_distribute(agent_id)
        self.processed += 1

    # ------------------------------------------------------------- background GBA
    def _launch_gba(self, agent_id: int):
        """Detached per-agent GBA (reference: LoopClosing.cc:602).  The
        scheduler worker returns immediately; results apply under
        store.lock only if no newer push aborted the run; a successful
        run re-distributes the corrected map."""
        med = self.mediators[agent_id]
        prev = self._gba_threads.get(agent_id)
        prev_ev = self._gba_abort.get(agent_id)
        if prev is not None and prev.is_alive() and prev_ev is not None:
            prev_ev.set()           # supersede the in-flight run
        ev = threading.Event()
        self._gba_abort[agent_id] = ev

        def run():
            med.loop_closing.global_ba(self.gba_iters, should_abort=ev.is_set)
            if not ev.is_set():
                self.map_distribute(agent_id)

        t = threading.Thread(target=run, daemon=True,
                             name=f"gba-{agent_id}")
        self._gba_threads[agent_id] = t
        t.start()

    def wait_gba_idle(self, timeout: float = 60.0):
        """Join all in-flight background GBA threads (shutdown barrier)."""
        for t in list(self._gba_threads.values()):
            t.join(timeout=timeout)

    def map_distribute(self, agent_id: int):
        """Ship the server-side delta (rebased poses, virtual KFs, fused
        points) back to the client (reference: MapDistribute)."""
        med = self.mediators[agent_id]
        with med.store.lock:
            sl = med.mapit.archive(include_twl=True)
        if not any(sl.counts()) and sl.twl is None:
            return
        payload = codec.encode_slice(sl)
        if self.distribute_fn is not None:
            self.distribute_fn(agent_id, payload)

    # ------------------------------------------------------------------ worker
    def process_pending(self) -> int:
        """Drain the queue synchronously (combined mode / tests)."""
        n = 0
        while True:
            with self._cv:
                if not self._heap:
                    return n
                _, agent_id = heapq.heappop(self._heap)
                sl = self._fifo[agent_id].popleft()
            self.process_request(agent_id, sl)
            n += 1

    def start_worker(self):
        def run():
            while not self._stop:
                with self._cv:
                    while not self._heap and not self._stop:
                        self._cv.wait(0.1)
                    if self._stop:
                        return
                    _, agent_id = heapq.heappop(self._heap)
                    sl = self._fifo[agent_id].popleft()
                    self._in_flight = True
                try:
                    self.process_request(agent_id, sl)
                except Exception:  # noqa: BLE001 — worker must survive
                    _log.exception("request processing failed for agent %d", agent_id)
                finally:
                    with self._cv:
                        self._in_flight = False
                        self._cv.notify_all()

        self._in_flight = False
        self._worker = threading.Thread(target=run, daemon=True)
        self._worker.start()

    def wait_queue_idle(self, timeout: float = 120.0):
        """Block until the worker has drained the queue (shutdown/flush
        barrier for combined mode)."""
        import time as _time

        deadline = _time.monotonic() + timeout
        with self._cv:
            while self._heap or getattr(self, "_in_flight", False):
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    _log.warning("wait_queue_idle timed out (%d queued)",
                                 len(self._heap))
                    return
                self._cv.wait(min(0.05, remaining))

    def stop(self):
        self._stop = True
        for ev in self._gba_abort.values():
            ev.set()
        with self._cv:
            self._cv.notify_all()
        if self._worker is not None:
            self._worker.join(timeout=5)
        self.wait_gba_idle(timeout=5)
