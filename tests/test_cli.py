"""CLI + checkpoint/resume end-to-end (tiny images, CPU)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from dpst_tpu.utils import io

ENV = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    r = np.random.default_rng(9)
    c = str(d / "content.png")
    s = str(d / "style.png")
    io.save_image(r.uniform(0, 255, (32, 32, 3)), c)
    io.save_image(r.uniform(0, 255, (32, 32, 3)), s)
    return c, s, d


def _run_cli(args):
    return subprocess.run(
        [sys.executable, "-m", "dpst_tpu"] + args,
        capture_output=True, text=True, env=ENV,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_cli_basic(image_files):
    c, s, d = image_files
    out = str(d / "out.png")
    r = _run_cli(["--content", c, "--style", s, "--output", out,
                  "--size", "32", "--iterations", "5",
                  "--no-segmentation", "--no-photorealism",
                  "--dtype", "float32", "--no-compile-cache"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)
    assert "final losses" in r.stdout
    img = io.load_image(out)
    assert img.shape == (32, 32, 3)


def test_cli_intermediates_and_csv(image_files):
    c, s, d = image_files
    out = str(d / "out2.png")
    inter = str(d / "inter")
    csv = str(d / "loss.csv")
    r = _run_cli(["--content", c, "--style", s, "--output", out,
                  "--size", "32", "--iterations", "6",
                  "--intermediate-interval", "3",
                  "--intermediate-dir", inter, "--loss-csv", csv,
                  "--no-segmentation", "--no-photorealism",
                  "--dtype", "float32", "--no-compile-cache"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert sorted(os.listdir(inter)) == ["iter_00003.png",
                                         "iter_00006.png"]
    hist = np.loadtxt(csv, delimiter=",", skiprows=1)
    assert hist.shape == (6, 5)


def test_cli_missing_content(image_files):
    c, s, d = image_files
    r = _run_cli(["--style", s])
    assert r.returncode != 0
    assert "--content" in r.stderr


def test_checkpoint_resume(image_files, tmp_path):
    """Interrupted run resumes from the orbax checkpoint (SURVEY.md §5)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dpst_tpu import StylizeConfig, stylize

    c, s, d = image_files
    ckpt = str(tmp_path / "ckpt")
    cfg = StylizeConfig(use_segmentation=False, use_photorealism=False,
                        compute_dtype="float32", iterations=4,
                        intermediate_interval=2, checkpoint_dir=ckpt)
    # run 4 steps (checkpoints at 2 and 4)
    out1 = stylize(c, s, cfg)
    assert len(os.listdir(ckpt)) > 0

    # "resume" a longer run: should continue from step 4, not restart
    cfg2 = StylizeConfig(use_segmentation=False, use_photorealism=False,
                         compute_dtype="float32", iterations=6,
                         intermediate_interval=2, checkpoint_dir=ckpt)
    out2, hist = stylize(c, s, cfg2, resume=True, return_history=True)
    assert hist.shape[0] == 2  # only steps 5..6 were newly run
    assert np.all(np.isfinite(out2))


def test_resume_equals_straight_run(image_files, tmp_path):
    """4 steps + resume(4 more) ≡ 8 straight steps (same trajectory)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dpst_tpu import StylizeConfig, stylize

    c, s, d = image_files
    base = dict(use_segmentation=False, use_photorealism=False,
                compute_dtype="float32", intermediate_interval=4)
    straight = stylize(c, s, StylizeConfig(iterations=8, **base))

    ckpt = str(tmp_path / "ckpt2")
    stylize(c, s, StylizeConfig(iterations=4, checkpoint_dir=ckpt, **base))
    resumed = stylize(c, s, StylizeConfig(iterations=8,
                                          checkpoint_dir=ckpt, **base),
                      resume=True)
    np.testing.assert_allclose(resumed, straight, atol=0.5, rtol=1e-2)


def test_cli_preset(image_files):
    c, s, d = image_files
    out = str(d / "preset_out.png")
    r = _run_cli(["--content", c, "--style", s, "--output", out,
                  "--preset", "config1", "--size", "24",
                  "--iterations", "4", "--no-compile-cache"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)


def test_preset_override_semantics(image_files):
    """Preset supplies the base; explicit flags win over it."""
    c, s, _ = image_files
    from dpst_tpu.cli import build_parser, config_from_args
    argv = ["--content", c, "--style", s, "--preset", "config3",
            "--iterations", "7"]
    cfg = config_from_args(build_parser().parse_args(argv), argv)
    assert cfg.iterations == 7                    # explicit flag wins
    assert cfg.use_photorealism is True           # from the preset
    argv2 = ["--content", c, "--style", s, "--preset", "config4"]
    cfg2 = config_from_args(build_parser().parse_args(argv2), argv2)
    assert cfg2.scales == (256, 512, 1024)        # preset's schedule


def test_preset_override_explicit_default_value(image_files):
    """A flag passed explicitly AT its parser-default value still
    overrides the preset (ADVICE r1: config1 sets float32; an explicit
    --dtype bfloat16 — the parser default — must win)."""
    c, s, _ = image_files
    from dpst_tpu.cli import build_parser, config_from_args
    argv = ["--content", c, "--style", s, "--preset", "config1",
            "--dtype", "bfloat16"]
    cfg = config_from_args(build_parser().parse_args(argv), argv)
    assert cfg.compute_dtype == "bfloat16"        # explicit-at-default wins
    assert cfg.use_photorealism is False          # rest of preset intact
    # without the explicit flag the preset's dtype survives
    argv2 = ["--content", c, "--style", s, "--preset", "config1"]
    cfg2 = config_from_args(build_parser().parse_args(argv2), argv2)
    assert cfg2.compute_dtype == "float32"


def test_cli_content_dir_batch(image_files, tmp_path):
    """--content-dir stylizes a whole directory in one sharded batch."""
    c, s, d = image_files
    r = np.random.default_rng(77)
    src = tmp_path / "batchsrc"
    src.mkdir()
    for i in range(4):
        io.save_image(r.uniform(0, 255, (24, 24, 3)),
                      str(src / f"img{i}.png"))
    outdir = str(tmp_path / "batchout")
    res = _run_cli(["--content-dir", str(src), "--style", s,
                    "--output", outdir, "--size", "24",
                    "--iterations", "4", "--no-segmentation",
                    "--no-photorealism", "--dtype", "float32",
                    "--no-compile-cache"])
    assert res.returncode == 0, res.stderr[-2000:]
    assert sorted(os.listdir(outdir)) == [f"img{i}.png" for i in range(4)]
    assert "stylized 4 images" in res.stdout


def test_cli_content_dir_batch_with_segmentation(image_files, tmp_path):
    """--content-dir with automatic segmentation goes through the
    batched path (segmentation.automatic_masks_batch — one chunked
    PSPNet dispatch for all contents + one for the style)."""
    c, s, d = image_files
    r = np.random.default_rng(78)
    src = tmp_path / "segsrc"
    src.mkdir()
    for i in range(2):
        io.save_image(r.uniform(0, 255, (24, 24, 3)),
                      str(src / f"img{i}.png"))
    outdir = str(tmp_path / "segout")
    res = _run_cli(["--content-dir", str(src), "--style", s,
                    "--output", outdir, "--size", "24",
                    "--iterations", "2", "--no-photorealism",
                    "--max-classes", "4", "--dtype", "float32",
                    "--no-compile-cache"])
    assert res.returncode == 0, res.stderr[-2000:]
    assert sorted(os.listdir(outdir)) == ["img0.png", "img1.png"]


def test_cli_requires_content_or_dir(image_files):
    c, s, _ = image_files
    res = _run_cli(["--style", s])
    assert res.returncode != 0
    assert "--content" in res.stderr


def test_cli_empty_content_dir(image_files, tmp_path):
    c, s, _ = image_files
    empty = tmp_path / "empty"
    empty.mkdir()
    res = _run_cli(["--content-dir", str(empty), "--style", s])
    assert res.returncode != 0
    assert "no images found" in (res.stderr + res.stdout)


def test_cli_device_flag(image_files, tmp_path):
    c, s, d = image_files
    out = str(tmp_path / "dev.png")
    r = _run_cli(["--content", c, "--style", s, "--output", out,
                  "--size", "24", "--iterations", "2",
                  "--no-segmentation", "--no-photorealism",
                  "--dtype", "float32", "--device", "0",
                  "--no-compile-cache"])
    assert r.returncode == 0, r.stderr[-1500:]
    assert os.path.exists(out)
    r2 = _run_cli(["--content", c, "--style", s, "--device", "99"])
    assert r2.returncode != 0
    assert "out of range" in (r2.stderr + r2.stdout)


def test_cli_content_dir_metrics(image_files, tmp_path):
    c, s_, d = image_files
    import shutil
    src = tmp_path / "batchsrc"
    src.mkdir()
    shutil.copy(c, src / "a.png")
    shutil.copy(s_, src / "b.png")
    outdir = str(tmp_path / "batchout")
    r = _run_cli(["--content-dir", str(src), "--style", s_,
                  "--output", outdir, "--size", "32", "--iterations", "3",
                  "--no-segmentation", "--no-photorealism", "--metrics",
                  "--dtype", "float32", "--no-compile-cache"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.count("SSIM=") == 2
    assert os.path.exists(os.path.join(outdir, "a.png"))


def test_cli_multiscale_intermediates_no_collision(image_files, tmp_path):
    """Multi-scale intermediate dumps use a GLOBAL step counter so stage
    2 never overwrites stage 1's files (VERDICT r2 weak #4)."""
    c, s, _ = image_files
    out = str(tmp_path / "ms.png")
    inter = str(tmp_path / "inter_ms")
    r = _run_cli(["--content", c, "--style", s, "--output", out,
                  "--size", "32", "--iterations", "4",
                  "--scales", "16", "32",
                  "--intermediate-interval", "2",
                  "--intermediate-dir", inter,
                  "--no-segmentation", "--no-photorealism",
                  "--dtype", "float32", "--no-compile-cache"])
    assert r.returncode == 0, r.stderr[-2000:]
    # stage 1 (16²): global steps 2, 4; stage 2 (32²): 6, 8
    assert sorted(os.listdir(inter)) == [
        "iter_00002.png", "iter_00004.png",
        "iter_00006.png", "iter_00008.png"]
    # the early dumps really are the coarse stage
    assert io.load_image(os.path.join(inter, "iter_00002.png")).shape \
        == (16, 16, 3)
    assert io.load_image(os.path.join(inter, "iter_00008.png")).shape \
        == (32, 32, 3)


def test_cli_spatial_matches_unsharded(image_files, tmp_path):
    """--spatial N through the CLI on the virtual 8-device mesh ≡ the
    unsharded run (VERDICT r2 missing #4)."""
    c, s, _ = image_files
    env = dict(ENV, XLA_FLAGS="--xla_force_host_platform_device_count=8")
    out_sp = str(tmp_path / "sp.png")
    out_ref = str(tmp_path / "ref.png")
    common = ["--content", c, "--style", s, "--size", "32",
              "--iterations", "4", "--no-segmentation",
              "--laplacian-impl", "xla", "--dtype", "float32",
              "--no-compile-cache"]
    r1 = subprocess.run(
        [sys.executable, "-m", "dpst_tpu"] + common
        + ["--output", out_sp, "--spatial", "4", "--metrics"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "4-way row-sharded" in r1.stdout
    assert "SSIM=" in r1.stdout
    r2 = _run_cli(common + ["--output", out_ref])
    assert r2.returncode == 0, r2.stderr[-2000:]
    np.testing.assert_allclose(io.load_image(out_sp),
                               io.load_image(out_ref), atol=3.0)


def test_cli_spatial_flag_validation(image_files):
    c, s, _ = image_files
    # spmd Laplacian needs the row-sharded mesh (ADVICE r2)
    r = _run_cli(["--content", c, "--style", s,
                  "--laplacian-impl", "spmd"])
    assert r.returncode != 0
    assert "--spatial" in r.stderr
    # --spatial composes with neither autotune nor content-dir
    r2 = _run_cli(["--content", c, "--style", s, "--spatial", "2",
                   "--autotune"])
    assert r2.returncode != 0
    # more devices than exist
    r3 = _run_cli(["--content", c, "--style", s, "--spatial", "64",
                   "--no-compile-cache"])
    assert r3.returncode != 0
    assert "device" in (r3.stderr + r3.stdout)


def test_cli_lbfgs_history_terms(image_files, tmp_path):
    """Default L-BFGS logs totals-only (no extra per-step forward);
    --history-terms full restores the per-term report."""
    c, s, _ = image_files
    out = str(tmp_path / "lb.png")
    common = ["--content", c, "--style", s, "--output", out,
              "--size", "32", "--iterations", "4",
              "--optimizer", "lbfgs", "--no-segmentation",
              "--no-photorealism", "--dtype", "float32",
              "--no-compile-cache"]
    r = _run_cli(common)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "per-term history off" in r.stdout
    r2 = _run_cli(common + ["--history-terms", "full"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "final losses" in r2.stdout and "content=" in r2.stdout


def test_cli_metrics_flag(image_files):
    c, s, d = image_files
    out = str(d / "out_metrics.png")
    r = _run_cli(["--content", c, "--style", s, "--output", out,
                  "--size", "32", "--iterations", "3",
                  "--no-segmentation", "--no-photorealism", "--metrics",
                  "--dtype", "float32", "--no-compile-cache"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SSIM=" in r.stdout and "PSNR=" in r.stdout
    # SSIM is in [-1, 1]; parse it back out of the report line
    line = [l for l in r.stdout.splitlines() if "SSIM=" in l][0]
    ssim_val = float(line.split("SSIM=")[1].split()[0])
    assert -1.0 <= ssim_val <= 1.0
