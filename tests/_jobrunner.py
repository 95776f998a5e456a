"""Persistent job-runner for the test suite.

The heavy job tests (build_all / assign_pages / clean_corpus /
maintain_pages) each spawned a fresh interpreter per job run: ~30 job
launches across the suite at ~9 s of JVM + SparkSession cold start
each — ~4.5 minutes of pure startup. A SparkSession RESTART inside one
live JVM costs ~0.3 s, so this module keeps ONE child interpreter alive
for the whole pytest session and executes jobs/<script>.main(argv)
requests in it sequentially.

What is preserved vs subprocess.run:
- the exact production entry point (each job's main(argv), its own
  argparse, its own get_spark/stop lifecycle — a fresh SparkContext per
  request);
- stdout JSON contract (captured per request and returned);
- crash-window simulations (they manipulate cursor/manifest FILES
  between runs, not processes).

What still needs a REAL subprocess (keep using subprocess.run there):
- killing a job mid-run;
- sys.path isolation tests (package-only engine.zip contract);
- tests that must observe a torn process state.

Protocol: file-based request/response in a scratch dir — the child's
fd 1/2 are shared with the JVM, so pipes are not a clean channel.
"""

from __future__ import annotations

import atexit
import json
import os
import subprocess
import sys
import tempfile
import time
from types import SimpleNamespace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_runner: "_JobRunner | None" = None


def run_job(script: str, args: list[str], env: dict | None = None, timeout: float = 560):
    """Execute jobs/<script> main(args) in the persistent child.

    Returns a CompletedProcess-shaped object (returncode, stdout,
    stderr). `env` entries are applied around the request inside the
    child (value None deletes the variable for the run)."""
    global _runner
    if _runner is None or not _runner.alive():
        _runner = _JobRunner()
    try:
        return _runner.run(script, args, env=env, timeout=timeout)
    except TimeoutError:
        # a hung job poisons the shared child: kill it so later tests get
        # a fresh one, then surface the timeout like subprocess would
        _runner.stop()
        _runner = None
        raise


def run_code(code: str, argv: list[str], env: dict | None = None, timeout: float = 560):
    """Execute a python script string (sys.argv patched) in the
    persistent child — for tests that need a real script run but not a
    jobs/*.py entry point. The script MUST stop any SparkSession it
    starts (the interpreter is shared)."""
    global _runner
    if _runner is None or not _runner.alive():
        _runner = _JobRunner()
    try:
        return _runner.request(
            {"code": code, "argv": list(argv), "env": env}, timeout=timeout
        )
    except TimeoutError:
        _runner.stop()
        _runner = None
        raise


class _JobRunner:
    def __init__(self) -> None:
        self.box = tempfile.mkdtemp(prefix="tzbb-jobrunner-")
        self.n = 0
        self.log_path = os.path.join(self.box, "child.log")
        self._log = open(self.log_path, "wb")
        self.proc = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_jobrunner_child.py"), self.box],
            cwd=REPO,
            stdout=self._log,
            stderr=subprocess.STDOUT,
            env={**os.environ, "PYTHONPATH": REPO},
        )
        atexit.register(self.stop)

    def alive(self) -> bool:
        return self.proc.poll() is None

    def run(self, script: str, args: list[str], env: dict | None = None, timeout: float = 560):
        return self.request(
            {"script": script, "args": list(args), "env": env}, timeout=timeout
        )

    def request(self, payload: dict, timeout: float = 560):
        req = os.path.join(self.box, f"req-{self.n}.json")
        resp = os.path.join(self.box, f"resp-{self.n}.json")
        self.n += 1
        tmp = req + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, req)  # atomic: the child never reads a torn request
        deadline = time.monotonic() + timeout
        while not os.path.exists(resp):
            if not self.alive():
                tail = open(self.log_path, "rb").read()[-3000:].decode(errors="replace")
                raise RuntimeError(f"job-runner child died; log tail:\n{tail}")
            if time.monotonic() > deadline:
                raise TimeoutError(f"job request {payload} exceeded {timeout}s")
            time.sleep(0.02)
        r = json.load(open(resp))
        return SimpleNamespace(
            returncode=r["rc"], stdout=r["stdout"], stderr=r["err"]
        )

    def stop(self) -> None:
        try:
            open(os.path.join(self.box, "stop"), "w").close()
            self.proc.wait(timeout=10)
        except Exception:
            self.proc.kill()
        finally:
            try:
                self._log.close()
            except Exception:
                pass
