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


ZIP_PROBE = textwrap.dedent(
    """
    import sys
    assert not any(p == {repo!r} for p in sys.path), "repo leaked onto sys.path"
    import geomatics_geotk_spark
    assert ".zip" in geomatics_geotk_spark.__file__, geomatics_geotk_spark.__file__
    from geomatics_geotk_spark.session import get_spark
    from geomatics_geotk_spark.operators import spatial_join, similarity
    from geomatics_geotk_spark.sources.documents import synth_documents

    spark = get_spark("zip-probe")
    docs = synth_documents(spark, 2000, partitions=4)
    tiled = spatial_join.tile_assign(spatial_join.decode_geo_spans(docs), 12)
    assert tiled.count() == 2000
    # Arrow batch UDF: the python WORKERS must also import from the zip
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    assert similarity.unit_normalize(emb).count() == 100
    spark.stop()
    print("ZIP-PROBE-OK", flush=True)
    """
)


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_py_files_zip_is_whole_deployment(tmp_path):
    """The north-rule deployment claim end-to-end: package the engine as
    ONE zip, ship it with --py-files, and run driver-side plan building
    AND executor-side Arrow UDFs with NO repo on sys.path."""
    zip_path = tmp_path / "geomatics_geotk_spark.zip"
    subprocess.run(["zip", "-qr", str(zip_path), "geomatics_geotk_spark"],
                   cwd=REPO, check=True)
    probe = tmp_path / "zipprobe.py"
    probe.write_text(ZIP_PROBE.format(repo=REPO))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.pop("PYSPARK_GATEWAY_PORT", None)
    out = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(zip_path), str(probe)],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ZIP-PROBE-OK" in out.stdout, out.stdout


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
