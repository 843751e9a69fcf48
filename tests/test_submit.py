"""North-rule deploy surface: ``spark-submit --py-files dist/loong_spark.zip``.

The rule's deploy clause ("run via spark-submit --py-files on a
multi-executor cluster") was previously documented (cli.py docstring,
README) but never executed. This test proves the packaged zip is the
SOLE provider of the package: the primary script is copied OUT of the
repo into a scratch cwd where ``import loong_spark`` is unresolvable,
the subprocess env carries no PYTHONPATH, and a negative control shows
the same invocation fails without the zip. On a real cluster only
``--master`` changes.

Reference parity: the Perl deploy surface is ``script/task_invoker.pl``
run per-worker-process (reference conf ``process_num=8``); here one
submit ships the whole package to every executor.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _scrubbed_env() -> dict:
    """Subprocess env with no path back to the repo checkout."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    # keep the demo JVM small next to the test-session JVM
    env["LOONG_DRIVER_MEM"] = "2g"
    env["SPARK_GRAFT_CPUS"] = "4"
    return env


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_demo_crawl(tmp_path):
    # 1. package: the shipped script builds dist/loong_spark.zip
    subprocess.run(
        ["sh", os.path.join(REPO, "scripts", "make_pyfiles_zip.sh")],
        check=True, capture_output=True, cwd=REPO,
    )
    zip_path = tmp_path / "loong_spark.zip"
    shutil.copy(os.path.join(REPO, "dist", "loong_spark.zip"), zip_path)
    main_py = tmp_path / "submit_main.py"
    shutil.copy(os.path.join(REPO, "loong_spark", "cli.py"), main_py)

    env = _scrubbed_env()
    wh = tmp_path / "wh"
    # cores come from SPARK_GRAFT_CPUS=4 in the scrubbed env (the
    # top-level --cores flag would have to precede the subcommand)
    crawl_args = [
        "crawl", "--warehouse", str(wh), "--demo", "--demo-pages", "150",
        "--max-batches", "2",
    ]

    # 2. negative control: without the zip the package must be
    # unresolvable from this cwd (fails fast at import, pre-JVM)
    neg = subprocess.run(
        [sys.executable, str(main_py)] + crawl_args,
        capture_output=True, text=True, cwd=tmp_path, env=env,
    )
    assert neg.returncode != 0
    assert "No module named 'loong_spark'" in neg.stderr

    # 3. the real deploy path: spark-submit ships the zip to driver and
    # executors; only --master would change on a cluster
    pos = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--driver-memory", "4g",
         "--py-files", str(zip_path), str(main_py)] + crawl_args,
        capture_output=True, text=True, cwd=tmp_path, env=env,
        timeout=600,
    )
    assert pos.returncode == 0, pos.stderr[-4000:]
    metrics = [json.loads(line) for line in pos.stdout.splitlines()
               if line.startswith("{")]
    assert len(metrics) == 2  # one row per micro-batch
    assert [m["batch_id"] for m in metrics] == [1, 2]
    assert all(m["frontier_size"] >= 0 for m in metrics)
    assert metrics[0]["urls_scheduled"] > 0  # the crawl actually crawled

    # 4. the warehouse a submitted job wrote is resumable BY a submitted
    # job (north_rule: "resumable from checkpoint" + the deploy clause):
    # a fresh submit picks up at batch 3 with no bootstrap
    res = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--driver-memory", "4g",
         "--py-files", str(zip_path), str(main_py),
         "resume", "--warehouse", str(wh), "--max-batches", "3"],
        capture_output=True, text=True, cwd=tmp_path, env=env,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-4000:]
    resumed = [json.loads(line) for line in res.stdout.splitlines()
               if line.startswith("{")]
    assert [m["batch_id"] for m in resumed] == [3]
