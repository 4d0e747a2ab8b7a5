"""Per-row fidelity oracle (BASELINE.json input_hint: decoded-PCM
allclose with SNR >= 30 dB + transcript equality vs ground truth) and
the spark-submit --py-files launch path."""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

from menelaus_spark import audio, tables

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_per_row_pcm_and_transcript_fidelity(spark, tmp_path):
    """Write the table, read it back, and compare EVERY row against
    independently regenerated ground truth: decoded PCM must match at
    SNR >= 30 dB (here: exactly) and transcripts must be equal."""
    path = str(tmp_path / "fid")
    tables.write_audio_table(tables.audio_table(spark, n_rows=120, n_parts=3), path)
    read_back = spark.read.parquet(path).orderBy("clip_id").collect()
    truth = tables.audio_table(spark, n_rows=120, n_parts=3).orderBy("clip_id").collect()
    assert len(read_back) == 120
    for got, want in zip(read_back, truth):
        assert got["clip_id"] == want["clip_id"]
        assert got["transcript"] == want["transcript"]  # exact transcript equality
        sr_g, pcm_g = audio.wav_decode(bytes(got["bytes"]))
        sr_w, pcm_w = audio.wav_decode(bytes(want["bytes"]))
        assert sr_g == sr_w == got["sr_hz"]
        snr = audio.snr_db(pcm_w.astype(np.float64), pcm_g.astype(np.float64))
        assert snr >= 30.0  # parquet round-trip is lossless -> inf


def test_spark_submit_py_files(tmp_path):
    """Real `spark-submit --py-files menelaus_spark.zip` launch of the
    validation job (north rule launch mode)."""
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not available")

    # package the library
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_validation.py"), "package"],
        capture_output=True, text=True, check=True,
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    assert zipfile_ok(zip_path)

    # generate a small input table in a bare interpreter (no repo path)
    table_path = str(tmp_path / "tbl")
    gen = (
        "import sys; sys.path.insert(0, %r); "
        "from menelaus_spark import get_spark, tables; "
        "s = get_spark(cores=2, shuffle_partitions=2); "
        "tables.write_audio_table(tables.audio_table(s, n_rows=120, n_parts=3, "
        "real_codecs='full'), %r); "
        "s.stop()" % (REPO, table_path)
    )
    subprocess.run([sys.executable, "-c", gen], capture_output=True, text=True, check=True)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    res = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=2",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_validation.py"), "run",
            "--input", table_path,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--kdq-count-ubound", "20", "--kdq-bootstrap", "50",
            # the codec-mixed table: model every physical container so
            # the payload check holds table-wide through the REAL
            # launch path (mu-law/A-law linear, ADPCM block-quantized)
            "--payload-codecs", "",
            "--payload-bps", "ulaw=1,alaw=1,adpcm=60:256:505",
        ],
        capture_output=True, text=True, env=env, timeout=420,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    summary = json.loads([ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1])
    assert summary["partitions"] == 3
    assert summary["clips"] == 120
    assert summary["fail"] == 0


def zipfile_ok(path):
    import zipfile

    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
    return any(n == "menelaus_spark/runner.py" for n in names)
