"""Host scaling microprobe: does THIS BOX scale N -> 4N threads on (a) pure
CPU spin, (b) streaming memory traffic, (c) parquet-decode-shaped work?

The crawl engine's N-vs-4N efficiency is only meaningful if the host can
scale the underlying resources. Cloud sandboxes vary day to day (frequency,
memory channels, NUMA placement, neighbors); this probe separates "the
engine stopped scaling" from "the box stopped scaling". Each workload runs
pinned to cores 0..N-1 (same pinning as bench/scaling.py legs) in separate
processes, and reports aggregate throughput at N and 4N plus the ratio.

Usage: python bench/hostprobe.py [N] [seconds-per-leg]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys, time
kind = sys.argv[1]; dur = float(sys.argv[2])

if kind == "cpu":
    # pure ALU spin: no memory traffic beyond L1
    t0 = time.time(); n = 0; x = 1.0
    while time.time() - t0 < dur:
        for _ in range(10000):
            x = x * 1.0000001 + 1e-9
        n += 10000
    print(n / (time.time() - t0))
elif kind == "mem":
    # streaming memory traffic: copy a buffer far larger than LLC
    import numpy as np
    a = np.random.default_rng(0).random(32 * 1024 * 1024)  # 256 MB
    b = np.empty_like(a)
    t0 = time.time(); n = 0
    while time.time() - t0 < dur:
        np.copyto(b, a)
        n += a.nbytes * 2  # read + write
    print(n / (time.time() - t0))
elif kind == "parquet":
    # parquet decode: the shape of the crawl's per-round web scan
    import io
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    rng = np.random.default_rng(0)
    body = ["<html>" + "x" * 4000 + "</html>"] * 20000
    t = pa.table({"url": [f"https://h{i}.test/p" for i in range(20000)],
                  "body": body,
                  "n": rng.integers(0, 1 << 30, 20000)})
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="snappy")
    raw = buf.getvalue()
    t0 = time.time(); n = 0
    while time.time() - t0 < dur:
        pq.read_table(io.BytesIO(raw))
        n += len(raw)
    print(n / (time.time() - t0))
"""


def leg(kind: str, nproc: int, dur: float) -> float:
    """Aggregate throughput of `nproc` worker processes pinned to cores
    0..nproc-1 (one core each, like executor task slots)."""
    procs = []
    for i in range(nproc):
        procs.append(subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", WORKER,
             kind, str(dur)],
            stdout=subprocess.PIPE, text=True))
    total = 0.0
    for p in procs:
        out, _ = p.communicate(timeout=dur * 10 + 120)
        total += float(out.strip().splitlines()[-1])
    return total


def main():
    n_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    dur = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    n_hi = 4 * n_lo
    out = {"n_lo": n_lo, "n_hi": n_hi}
    for kind in ("cpu", "mem", "parquet"):
        lo = leg(kind, n_lo, dur)
        hi = leg(kind, n_hi, dur)
        out[kind] = {
            "lo": round(lo, 1), "hi": round(hi, 1),
            "speedup": round(hi / lo, 3),
            "efficiency": round(hi / lo / (n_hi / n_lo), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
