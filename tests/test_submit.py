"""North-rule run mode: `spark-submit --py-files <pkg>.zip`.

Packages the engine with tools/make_pyfiles_zip.py and launches the CLI
through a REAL spark-submit subprocess from an empty working directory
(with the repo stripped from PYTHONPATH), so every engine import must
resolve from the zip shipped via --py-files — exactly how a cluster
deployment receives the code (reference: benchmark.sh runs a compiled
binary; our deployable artifact is the zip)."""

import json
import os
import subprocess
import sys

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """\
import sys
from hypergraph_gpu_label_propagation_spark.cli import main
sys.exit(main(sys.argv[1:]))
"""


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    assert os.path.exists(spark_submit)

    zip_path = str(tmp_path / "engine.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles_zip.py"), zip_path],
        check=True, cwd=REPO, capture_output=True,
    )
    runner = tmp_path / "runner.py"
    runner.write_text(RUNNER)
    metrics = tmp_path / "metrics.json"

    env = dict(os.environ)
    # the repo must NOT be importable from the driver's cwd/path — the
    # zip has to supply the package
    env["PYTHONPATH"] = ""
    env.pop("SPARK_HOME", None)  # use the pyspark wheel's own jars
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zip_path,
            str(runner),
            "--uniform", "-v", "200", "-e", "400",
            "--label-classes", "4", "--label-seed", "7",
            "--cores", "4",
            "--metrics-json", str(metrics),
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=280,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(metrics.read_text())
    assert summary["converged"] is True
    assert summary["iterations"] >= 1
    # the run-config echo (reference print_cli_summary analog) is on stdout
    echo = [l for l in proc.stdout.splitlines() if l.startswith("# hypergraph:")]
    assert echo and "nv=200" in echo[0]
