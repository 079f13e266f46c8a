"""Daemon entry point: `python -m wmix_tpu.service.daemon [options]`.

Mirrors src/wmix.c main (:2064-2183) + wmix_start/main_loop
(:2015-2060): parse geometry flags, run the daemon, restart it if the
core stops (the watchdog loop)."""
from __future__ import annotations

import os
import sys
import time

from wmix_tpu.config import EngineConfig
from wmix_tpu.service.core import WmixDaemon
from wmix_tpu.service.hal import LoopHal, NullHal


def main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    chn, freq, interval = 1, 8000, 20
    debug = False
    hal_name = "null"
    i = 0
    while i < len(args):
        a = args[i]
        if a == "-c":
            i += 1
            chn = int(args[i])
        elif a == "-f":
            i += 1
            freq = int(args[i])
        elif a == "-t":
            i += 1
            interval = int(args[i])
        elif a == "-d":
            debug = True
        elif a == "--hal":
            i += 1
            hal_name = args[i]
        elif a in ("-?", "--help"):
            print("usage: daemon [-c chn] [-f freq] [-t interval_ms] [-d] "
                  "[--hal null|loop|alsa]")
            return 0
        i += 1

    cfg = EngineConfig(chn=chn, freq=freq, interval_ms=interval)
    if hal_name == "alsa":
        # the reference's default platform (platform/alsa/plat.c)
        from wmix_tpu.service.hal_alsa import AlsaHal
        hal = AlsaHal()
    else:
        hal = LoopHal() if hal_name == "loop" else NullHal()

    # WMIX_TRACE=<logdir>: capture a jax profiler trace for the daemon
    # lifetime (utils/trace.py; SURVEY §5 tracing row)
    trace_ctx = None
    logdir = os.environ.get("WMIX_TRACE")
    if logdir:
        from wmix_tpu.utils.trace import profile
        trace_ctx = profile(logdir)
        trace_ctx.__enter__()

    # watchdog: restart the core when it exits without a SIGINT
    # (main_loop, src/wmix.c:2015-2046)
    while True:
        d = WmixDaemon(cfg, hal=hal, realtime=True, debug=debug)
        print(f"wmix-tpu daemon: chn={chn} freq={freq} interval={interval}")
        d.start()
        try:
            while d.run:
                time.sleep(0.5)
        except KeyboardInterrupt:
            d.stop()
            if trace_ctx is not None:
                trace_ctx.__exit__(None, None, None)
            return 0
        d.stop()
        time.sleep(0.5)


if __name__ == "__main__":
    sys.exit(main())
