"""Minimal loguru stand-in so the reference (`/root/reference/rec_pangu`) can run
in this image for head-to-head quality-parity measurement (VERDICT.md item 1).

Only the surface the reference uses: `from loguru import logger` +
`logger.info/debug/warning/error` (e.g. rec_pangu/trainer.py:15,97).
"""
import sys
import time


class _Logger:
    def _log(self, level, msg, *args):
        if args:
            try:
                msg = str(msg).format(*args)
            except Exception:
                msg = " ".join([str(msg)] + [str(a) for a in args])
        ts = time.strftime("%Y-%m-%d %H:%M:%S")
        print(f"{ts} | {level:<8} | {msg}", file=sys.stderr, flush=True)

    def info(self, msg, *args, **kw):
        self._log("INFO", msg, *args)

    def debug(self, msg, *args, **kw):
        self._log("DEBUG", msg, *args)

    def warning(self, msg, *args, **kw):
        self._log("WARNING", msg, *args)

    def error(self, msg, *args, **kw):
        self._log("ERROR", msg, *args)

    def success(self, msg, *args, **kw):
        self._log("SUCCESS", msg, *args)

    def remove(self, *args, **kw):
        pass

    def add(self, *args, **kw):
        return 0


logger = _Logger()
