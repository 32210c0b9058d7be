"""Golden tests: byte-identical sidecars vs the compiled C reference, and
cross-implementation decode (we decode C archives; C decodes ours).
SURVEY.md §4 'Integration level'."""

import subprocess

import pytest

from shafa_tpu import cli

from corpus import edge_cases, incompressible, mixed, runs_heavy, text


def run_ref(ref_binary, workdir, args):
    r = subprocess.run([ref_binary, *args], cwd=workdir,
                       capture_output=True, text=True)
    return r


def run_ours(workdir, args):
    import contextlib
    import io
    import os
    old = os.getcwd()
    os.chdir(workdir)
    try:
        buf_out, buf_err = io.StringIO(), io.StringIO()
        with contextlib.redirect_stdout(buf_out), contextlib.redirect_stderr(buf_err):
            code = cli.main(list(args) + ["--backend", "numpy"])
        return code, buf_out.getvalue(), buf_err.getvalue()
    finally:
        os.chdir(old)


def setup_dirs(tmp_path, data):
    a = tmp_path / "ref"
    b = tmp_path / "ours"
    a.mkdir()
    b.mkdir()
    (a / "f").write_bytes(data)
    (b / "f").write_bytes(data)
    return a, b


def compare_files(a, b, names):
    for n in names:
        fa, fb = (a / n), (b / n)
        assert fa.exists() == fb.exists(), f"{n}: existence mismatch"
        if fa.exists():
            assert fa.read_bytes() == fb.read_bytes(), f"{n}: bytes differ"


CASES = {
    "mixed_200k_K": (mixed(200_000, 11), ["-b", "K"]),
    "mixed_100k_default": (mixed(100_000, 12), []),  # 64 KiB default quirk
    "text_300k_K": (text(300_000, 13), ["-b", "K"]),
    "runs_150k": (runs_heavy(150_000, 14), []),
    "incompressible_80k": (incompressible(80_000, 15), []),  # N mode (no RLE)
    "small_1k": (b"ab" * 512, []),  # exactly the 1 KiB minimum
}


@pytest.mark.parametrize("name", CASES.keys())
def test_compress_pipeline_golden(tmp_path, ref_binary, name):
    data, flags = CASES[name]
    a, b = setup_dirs(tmp_path, data)
    ra = run_ref(ref_binary, a, ["f", *flags])
    code, _, err = run_ours(b, ["f", *flags])
    assert (ra.returncode != 0) == (code != 0), (ra.stderr, err)
    compare_files(a, b, ["f.rle", "f.rle.freq", "f.freq", "f.rle.cod",
                         "f.cod", "f.rle.shaf", "f.shaf"])


@pytest.mark.parametrize("name", CASES.keys())
def test_roundtrip_and_cross_decode(tmp_path, ref_binary, name):
    data, flags = CASES[name]
    a, b = setup_dirs(tmp_path, data)
    run_ref(ref_binary, a, ["f", *flags])
    run_ours(b, ["f", *flags])
    # pick whatever archive was produced (RLE mode or N mode)
    arch = "f.rle.shaf" if (a / "f.rle.shaf").exists() else "f.shaf"
    # ours decodes C's archive
    (b / "c_arch").mkdir()
    for ext in [arch, arch.replace(".shaf", ".cod"),
                "f.rle.freq" if arch == "f.rle.shaf" else "f.freq"]:
        if (a / ext).exists():
            (b / "c_arch" / ext).write_bytes((a / ext).read_bytes())
    code, _, err = run_ours(b / "c_arch", [arch])
    assert code == 0, err
    assert (b / "c_arch" / "f").read_bytes() == data
    # C decodes our archive
    (a / "py_arch").mkdir()
    for ext in [arch, arch.replace(".shaf", ".cod"),
                "f.rle.freq" if arch == "f.rle.shaf" else "f.freq"]:
        if (b / ext).exists():
            (a / "py_arch" / ext).write_bytes((b / ext).read_bytes())
    r = run_ref(ref_binary, a / "py_arch", [arch])
    assert r.returncode == 0, r.stderr
    assert (a / "py_arch" / "f").read_bytes() == data


def test_force_flags_golden(tmp_path, ref_binary):
    # -c r forces RLE even when the gate says no; -c f adds the original-file
    # .freq alongside (f.c:278-294).
    data = incompressible(70_000, 21)
    a, b = setup_dirs(tmp_path, data)
    run_ref(ref_binary, a, ["f", "-m", "f", "-c", "r", "-c", "f"])
    run_ours(b, ["f", "-m", "f", "-c", "r", "-c", "f"])
    compare_files(a, b, ["f.rle", "f.rle.freq", "f.freq"])


def test_module_chain_t_standalone(tmp_path, ref_binary):
    data = mixed(50_000, 22)
    a, b = setup_dirs(tmp_path, data)
    run_ref(ref_binary, a, ["f", "-m", "f"])
    run_ours(b, ["f", "-m", "f"])
    ra = run_ref(ref_binary, a, ["f.rle.freq", "-m", "t"])
    code, _, err = run_ours(b, ["f.rle.freq", "-m", "t"])
    assert ra.returncode == 0 and code == 0
    compare_files(a, b, ["f.rle.cod"])
    ra = run_ref(ref_binary, a, ["f.rle", "-m", "c"])
    code, _, err = run_ours(b, ["f.rle", "-m", "c"])
    assert ra.returncode == 0 and code == 0
    compare_files(a, b, ["f.rle.shaf"])


def test_rle_only_decompress(tmp_path, ref_binary):
    data = runs_heavy(60_000, 23)
    a, b = setup_dirs(tmp_path, data)
    run_ref(ref_binary, a, ["f", "-m", "f"])
    run_ours(b, ["f", "-m", "f"])
    (a / "f").unlink()
    (b / "f").unlink()
    ra = run_ref(ref_binary, a, ["f.rle", "-m", "d"])
    code, _, err = run_ours(b, ["f.rle", "-m", "d"])
    assert ra.returncode == 0 and code == 0, (ra.stderr, err)
    assert (a / "f").read_bytes() == data
    assert (b / "f").read_bytes() == data


def test_shaf_only_decompress(tmp_path, ref_binary):
    # -d s on a .rle.shaf: decode SF only, regenerating the .rle stream
    data = mixed(60_000, 24)
    a, b = setup_dirs(tmp_path, data)
    run_ref(ref_binary, a, ["f"])
    run_ours(b, ["f"])
    rle_a = (a / "f.rle").read_bytes()
    (a / "f.rle").unlink()
    (b / "f.rle").unlink()
    ra = run_ref(ref_binary, a, ["f.rle.shaf", "-m", "d", "-d", "s"])
    code, _, err = run_ours(b, ["f.rle.shaf", "-m", "d", "-d", "s"])
    assert ra.returncode == 0 and code == 0, (ra.stderr, err)
    assert (a / "f.rle").read_bytes() == rle_a
    assert (b / "f.rle").read_bytes() == rle_a


@pytest.mark.parametrize("name,data", sorted(edge_cases().items()))
def test_edge_cases_golden(tmp_path, ref_binary, name, data):
    if len(data) < 1024:
        data = data * (1024 // max(1, len(data)) + 1)
    # Note: single-symbol INPUT is fine (its RLE stream has >=2 distinct
    # bytes); the documented deviation only bites when a HISTOGRAMMED stream
    # is single-symbol, which none of these corpora produce.
    a, b = setup_dirs(tmp_path, data)
    ra = run_ref(ref_binary, a, ["f"])
    code, _, err = run_ours(b, ["f"])
    assert (ra.returncode != 0) == (code != 0)
    compare_files(a, b, ["f.rle", "f.rle.freq", "f.freq", "f.rle.cod",
                         "f.cod", "f.rle.shaf", "f.shaf"])


def test_too_small_file(tmp_path, ref_binary):
    a, b = setup_dirs(tmp_path, b"tiny")
    ra = run_ref(ref_binary, a, ["f"])
    code, _, err = run_ours(b, ["f"])
    assert ra.returncode == 1 and code == 1
    assert "File too small" in ra.stderr and "File too small" in err


def test_cli_conflicts(tmp_path, ref_binary):
    data = mixed(10_000, 25)
    a, b = setup_dirs(tmp_path, data)
    for args in (["f", "-m", "f", "-m", "c"],  # c after f without t
                 ["f", "-m", "t"],             # t needs .freq ext
                 ["f", "-m", "t", "-m", "d"],  # d after t without c
                 ["f", "-x", "y"],             # unknown flag
                 ["f", "-m", "z"]):            # bad module
        ra = run_ref(ref_binary, a, args)
        code, _, err = run_ours(b, args)
        assert ra.returncode == 1 and code == 1, args
        assert ra.stderr.strip().splitlines()[-1] == err.strip().splitlines()[-1], args
