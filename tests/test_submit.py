"""The spark-submit deployment path (scripts/submit.sh) — the north
rule's "run via spark-submit --py-files on a multi-executor cluster".

Launches a REAL ``spark-submit`` subprocess with an explicit --master and
asserts the engine's session factory honors it instead of forcing its
local[N] default: before r5 ``get_spark`` always called
``builder.master(...)``, so a cluster submit silently ran the whole job
local on the driver host.
"""

import os
import shutil
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = textwrap.dedent(
    """
    from geomatics_geotk_spark.session import get_spark

    # bench.py-style call: an explicit local[N] arg that must LOSE to the
    # master a surrounding spark-submit provided
    spark = get_spark("submit-probe", master="local[32]")
    print("MASTER=" + spark.sparkContext.master, flush=True)
    print("PAR=%d" % spark.sparkContext.defaultParallelism, flush=True)
    spark.stop()
    """
)


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_submitted_master_wins(tmp_path):
    probe = tmp_path / "probe.py"
    probe.write_text(PROBE)
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("PYSPARK_GATEWAY_PORT", None)  # clean launch
    out = subprocess.run(
        ["spark-submit", "--master", "local[3]",
         "--conf", "spark.ui.enabled=false", str(probe)],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout.splitlines()
    assert "MASTER=local[3]" in lines, out.stdout
    assert "PAR=3" in lines, out.stdout


def test_direct_run_keeps_explicit_master():
    """Outside spark-submit (no gateway env) the explicit arg still wins —
    the scaling protocol depends on it."""
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    out = subprocess.run(
        [sys.executable, "-c",
         "from geomatics_geotk_spark.session import get_spark;"
         "s = get_spark('direct-probe', master='local[2]');"
         "print('MASTER=' + s.sparkContext.master); s.stop()"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "MASTER=local[2]" in out.stdout.splitlines(), out.stdout
