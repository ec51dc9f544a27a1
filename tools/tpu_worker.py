"""Persistent TPU measurement worker.

Polls /tmp/tpu_cmd.py; when its mtime changes, exec()s its contents in this
process's global namespace and appends output to /tmp/tpu_worker.log.
Keeps the TPU client, loaded problems, and warm executables alive across
experiments (process startup + remote warm-up through the axon tunnel cost
minutes otherwise).
"""
import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CMD = "/tmp/tpu_cmd.py"
LOG = "/tmp/tpu_worker.log"


def log(msg):
    with open(LOG, "a") as fh:
        fh.write(msg + "\n")


def main():
    g = {"__name__": "__tpu_worker__"}
    log(f"=== worker starting pid={os.getpid()} ===")
    exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "tpu_repl_init.py")).read(), g)
    log("=== prelude done, polling ===")
    last = 0.0
    while True:
        try:
            mt = os.path.getmtime(CMD)
        except OSError:
            time.sleep(1)
            continue
        if mt <= last:
            time.sleep(1)
            continue
        last = mt
        src = open(CMD).read()
        log(f"--- exec @{time.strftime('%H:%M:%S')} ---")
        buf = io.StringIO()
        old = sys.stdout
        sys.stdout = buf
        t0 = time.time()
        try:
            exec(src, g)
        except Exception:
            traceback.print_exc(file=buf)
        finally:
            sys.stdout = old
        log(buf.getvalue().rstrip())
        log(f"--- done ({time.time()-t0:.1f}s) ---")


if __name__ == "__main__":
    main()
