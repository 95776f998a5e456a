"""Child loop of the persistent test job-runner (see _jobrunner.py).

Executes jobs/<script>.main(argv) requests sequentially in THIS
interpreter: the JVM is started once, each request gets a fresh
SparkContext via the job's own get_spark/stop lifecycle. Per-request
stdout is captured (the jobs' JSON contract); the JVM's own fd-1/2
noise goes to the runner log, never into the protocol files.
"""

from __future__ import annotations

import importlib.util
import io
import json
import os
import sys
import time
import traceback
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_modules: dict[str, object] = {}


def _job_module(script: str):
    if script not in _modules:
        name = "jobrunner_" + script.replace(".py", "")
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REPO, "jobs", script)
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        _modules[script] = mod
    return _modules[script]


def _serve(box: str) -> None:
    n = 0
    stop = os.path.join(box, "stop")
    while True:
        req = os.path.join(box, f"req-{n}.json")
        while not os.path.exists(req):
            if os.path.exists(stop):
                return
            time.sleep(0.02)
        r = json.load(open(req))
        buf = io.StringIO()
        rc, err = 0, ""
        saved: dict[str, str | None] = {}
        try:
            for k, v in (r.get("env") or {}).items():
                saved[k] = os.environ.get(k)
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = str(v)
            with redirect_stdout(buf):
                if "code" in r:
                    # arbitrary script request (tests that are not a
                    # jobs/*.py module but still pay a full cold start
                    # per subprocess, e.g. the checkpoint-mode probe)
                    argv_saved = sys.argv
                    sys.argv = ["<jobrunner-code>"] + list(r.get("argv") or [])
                    try:
                        exec(compile(r["code"], "<jobrunner-code>", "exec"),
                             {"__name__": "__main__"})
                    finally:
                        sys.argv = argv_saved
                else:
                    rc = _job_module(r["script"]).main(r["args"]) or 0
        except SystemExit as e:  # argparse errors etc.
            rc = e.code if isinstance(e.code, int) else (0 if e.code is None else 1)
            err = buf.getvalue()[-2000:]
        except Exception:
            rc = 1
            err = traceback.format_exc()
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
            # a request that leaks a live SparkSession would poison every
            # later request (getOrCreate silently reuses it, wrong conf)
            if "pyspark.sql" in sys.modules:
                try:
                    from pyspark.sql import SparkSession

                    leaked = SparkSession._instantiatedSession
                    if leaked is not None and leaked.sparkContext._jsc is not None:
                        leaked.stop()
                        err = (err + "\n[jobrunner] stopped leaked session").strip()
                except Exception:
                    pass
        resp = os.path.join(box, f"resp-{n}.json")
        with open(resp + ".tmp", "w") as f:
            json.dump({"rc": rc, "stdout": buf.getvalue(), "err": err}, f)
        os.replace(resp + ".tmp", resp)
        n += 1


if __name__ == "__main__":
    _serve(sys.argv[1])
