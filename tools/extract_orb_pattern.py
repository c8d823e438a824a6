"""Transcribe the OpenCV learned ORB sampling pattern into a data file.

The 256-pair `bit_pattern_31_` table is OpenCV's learned rBRIEF pattern
(BSD-licensed public constant, opencv modules/features2d/src/orb.cpp;
embedded verbatim in the reference at
/root/reference/code/src/ORBextractor.cc:80-336).  It is pure data — the
*specification* of descriptor bit-compatibility — so we transcribe the
numbers, not the code, into swarmmap_tpu/data/orb_pattern_opencv.npz.

Usage:  python tools/extract_orb_pattern.py [path/to/ORBextractor.cc]
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

SRC = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
    "/root/reference/code/src/ORBextractor.cc")
OUT = Path(__file__).resolve().parent.parent / \
    "swarmmap_tpu" / "data" / "orb_pattern_opencv.npz"


def main() -> None:
    text = SRC.read_text(errors="replace")
    m = re.search(r"bit_pattern_31_\[256\*4\]\s*=\s*\{(.*?)\};", text, re.S)
    if not m:
        raise SystemExit(f"pattern table not found in {SRC}")
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    nums = [int(t) for t in re.findall(r"-?\d+", body)]
    assert len(nums) == 256 * 4, f"expected 1024 ints, got {len(nums)}"
    # table layout: x0,y0, x1,y1 per bit -> [512, 2] (pairs are (2i, 2i+1))
    pat = np.asarray(nums, np.int8).reshape(256, 4).reshape(256, 2, 2)
    pat = pat.reshape(512, 2)
    assert np.abs(pat).max() <= 31  # 31-px patch radius bound
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, pattern=pat)
    print(f"wrote {OUT}: {pat.shape} int8, |offset|max={np.abs(pat).max()}")


if __name__ == "__main__":
    main()
