"""One-command local validation (no TPU): full pytest, examples,
graft-entry dryrun, and CPU dry-runs of the chip tools. Exit 0 iff
everything passes. Run before ending a work round:

    python tools/verify_all.py [--quick]

--quick skips the full pytest (runs the fast core subset instead).
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def run(name, cmd, env=None, timeout=2400):
    print(f"== {name}: {' '.join(cmd)}", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    r = subprocess.run(cmd, cwd=REPO, env=e, timeout=timeout)
    if r.returncode != 0:
        print(f"FAILED: {name}", flush=True)
        sys.exit(1)


def main():
    quick = "--quick" in sys.argv
    py = sys.executable
    if quick:
        run(
            "pytest (core subset)",
            [py, "-m", "pytest", "tests/test_convert.py", "tests/test_formats.py",
             "tests/test_reorder.py", "tests/test_partition.py", "-q"],
        )
    else:
        run("pytest (full)", [py, "-m", "pytest", "tests/", "-q"])
    run("examples", [py, "examples/run_all_examples.py"])
    # dryrun branch only — the entry() compile check starts a TPU client
    # on this image, and verify_all must stay chip-free
    run(
        "graft multichip dryrun (CPU mesh)",
        [py, "__graft_entry__.py"],
        env={
            "_GRAFT_DRYRUN": "1",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        },
    )
    run(
        "chip suite CPU dry-run",
        [py, "tools/r4_tpu_suite.py", "ABCDE", "0.4", "--cpu"],
        env={"R4_TPU_OUT": "/tmp/r4_dryrun.json"},  # never clobber chip artifacts
    )
    run(
        "dia probe CPU dry-run",
        [py, "tools/probe_dia.py", "0.3", "--cpu"],
        env={"R4_TPU_OUT": "/tmp/r4_dryrun.json"},
    )
    run(
        "r5 chip suite CPU dry-run",
        [py, "tools/r5_perf.py", "ABCDEF", "0.4", "--cpu"],
        env={"R5_TPU_OUT": "/tmp/r5_dryrun.json"},
    )
    run(
        "visualizer CLI",
        [py, "-m", "sparsebase_tpu.utils.visualizer",
         "/root/reference/examples/data/ash958.mtx", "/tmp/viz_check.html",
         "--orderings", "rcm", "--parts", "16"],
    )
    print("ALL LOCAL VALIDATION GREEN", flush=True)


if __name__ == "__main__":
    main()
