"""The --py-files deployment artifact: complete, deterministic,
importable from the zip alone (what every executor sees)."""

import subprocess
import sys

from tools.make_pyfiles import build


def test_pyfiles_zip_deterministic_and_importable(tmp_path):
    out1 = str(tmp_path / "a.zip")
    out2 = str(tmp_path / "b.zip")
    names1 = build(out1)
    build(out2)
    assert open(out1, "rb").read() == open(out2, "rb").read()
    # every package module ships
    assert "llogtail_spark/pipeline.py" in names1
    assert "llogtail_spark/operators/similarity.py" in names1
    assert not any(n.startswith("tests") for n in names1)
    # import from the zip only (no repo dir on the path)
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import llogtail_spark.pipeline, llogtail_spark.operators.dedup; "
        "print('ok')"
    )
    r = subprocess.run(
        [sys.executable, "-c", code, out1],
        capture_output=True, text=True, cwd=str(tmp_path),
    )
    assert r.returncode == 0 and r.stdout.strip() == "ok", r.stderr
