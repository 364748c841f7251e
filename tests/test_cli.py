"""CLI surface end-to-end (subprocess, cpu platform/backend for speed)."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "myyuv_tpu", *map(str, args)],
        cwd=REPO, capture_output=True, text=True, timeout=300)


@pytest.fixture(scope="module")
def chef(images_dir):
    return images_dir / "chef-with-trumpet.myyuv"


def test_info(chef):
    r = run_cli(chef, "-info")
    assert r.returncode == 0
    assert "IYUV" in r.stdout and "992" in r.stdout


def test_compress_decompress_cpu(chef, tmp_path_factory, oracle_cli):
    tmp = tmp_path_factory.mktemp("cli")
    comp = tmp / "c.myyuv"
    dec = tmp / "d.myyuv"
    r = run_cli(chef, "-compress", "DCT", "50", "--backend", "cpu",
                "-o", comp)
    assert r.returncode == 0, r.stderr
    r = run_cli(comp, "-decompress", "--backend", "cpu", "-o", dec)
    assert r.returncode == 0, r.stderr
    # the independent reference binary decodes our file identically
    odec = tmp / "od.myyuv"
    subprocess.run([str(oracle_cli), str(comp), "-decompress", "-o",
                    str(odec)], check=True, capture_output=True)
    assert dec.read_bytes() == odec.read_bytes()


def test_bad_input_rejected(tmp_path):
    bad = tmp_path / "x.myyuv"
    bad.write_bytes(b"ZZ not an image")
    r = run_cli(bad, "-info")
    assert r.returncode == 1
    assert "error" in r.stderr.lower()
