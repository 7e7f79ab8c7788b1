#!/usr/bin/env python3
"""Run the Sibelia CLI in-process and report peak RSS (ru_maxrss).

Usage: measure_rss.py [sibelia CLI args...]
Prints one line at the end:  PEAK_RSS_MB <mb>  ELAPSED_S <s>
"""
import os
import resource
import sys
import threading
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sibelia_tpu.cli.sibelia import run  # noqa: E402

t0 = time.time()


def _sampler():
    while True:
        time.sleep(2)
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        kb = int(line.split()[1])
                        print("RSS t=%.0f rss_mb=%.0f"
                              % (time.time() - t0, kb / 1024.0),
                              file=sys.stderr, flush=True)
        except Exception:
            return


if os.environ.get("SIBELIA_RSS_TRACE") == "1":
    threading.Thread(target=_sampler, daemon=True).start()
rc = run(sys.argv[1:]) or 0
dt = time.time() - t0
peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print("PEAK_RSS_MB %.0f ELAPSED_S %.1f" % (peak_kb / 1024.0, dt),
      file=sys.stderr)
sys.exit(rc)
