"""Weight-converter tools: synthetic-checkpoint roundtrips (no network —
SURVEY.md §2 comp.14's drop-in path must be exercised end to end)."""
import os
import subprocess
import sys

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")


def _run(script, *args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", script), *args],
        capture_output=True, text=True, env=ENV, cwd=REPO)


def test_convert_vgg_roundtrip(tmp_path):
    from dpst_tpu.models.vgg import CONV_SHAPES, extract_features, \
        load_params
    from tools.convert_vgg import TORCHVISION_IDX

    r = np.random.default_rng(0)
    state = {}
    for (name, (cin, cout)), idx in zip(CONV_SHAPES.items(),
                                        TORCHVISION_IDX):
        state[f"features.{idx}.weight"] = torch.from_numpy(
            r.normal(0, 0.05, (cout, cin, 3, 3)).astype(np.float32))
        state[f"features.{idx}.bias"] = torch.from_numpy(
            r.normal(0, 0.05, cout).astype(np.float32))
    src = str(tmp_path / "vgg19.pth")
    dst = str(tmp_path / "vgg19.npz")
    torch.save(state, src)

    res = _run("convert_vgg.py", src, dst)
    assert res.returncode == 0, res.stderr[-1500:]
    params = load_params(dst)
    # OIHW -> HWIO transpose is exact (conv1_1 additionally BGR-flipped)
    w_src = state["features.2.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(params["conv1_2"]["w"]),
                                  w_src)
    w_c11 = state["features.0.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(params["conv1_1"]["w"]),
                                  w_c11[:, :, ::-1, :])
    # loaded params run
    import jax.numpy as jnp
    feats = extract_features(
        params, jnp.zeros((16, 16, 3)), ("conv1_1",),
        compute_dtype="float32")
    assert feats["conv1_1"].shape == (16, 16, 64)


def test_convert_pspnet_roundtrip(tmp_path):
    from dpst_tpu.models.pspnet import CONV_SPECS, load_params, segment
    from tools.convert_pspnet import build_key_map

    r = np.random.default_rng(1)
    key_map = build_key_map()
    state = {}
    for name, kh, kw, cin, cout in CONV_SPECS:
        if name == "head":
            state["cls.4.weight"] = torch.from_numpy(
                r.normal(0, 0.05, (cout, cin, 1, 1)).astype(np.float32))
            state["cls.4.bias"] = torch.zeros(cout)
            continue
        conv_p, bn_p = key_map[name]
        state[f"{conv_p}.weight"] = torch.from_numpy(
            r.normal(0, 0.05, (cout, cin, kh, kw)).astype(np.float32))
        state[f"{bn_p}.weight"] = torch.ones(cout)
        state[f"{bn_p}.bias"] = torch.zeros(cout)
        state[f"{bn_p}.running_mean"] = torch.zeros(cout)
        state[f"{bn_p}.running_var"] = torch.ones(cout)
    src = str(tmp_path / "pspnet.pth")
    dst = str(tmp_path / "pspnet.npz")
    torch.save(state, src)

    res = _run("convert_pspnet.py", src, dst)
    assert res.returncode == 0, res.stderr[-1500:]
    params = load_params(dst)
    import jax.numpy as jnp
    seg = segment(params, jnp.zeros((32, 32, 3)),
                  compute_dtype="float32")
    assert seg.shape == (32, 32)


def test_convert_nima_roundtrip(tmp_path):
    from dpst_tpu.models.nima import MB_BLOCKS, load_params, nima_score

    r = np.random.default_rng(2)
    state = {}
    idx = 0

    def put(cout, cin, k, depthwise=False):
        nonlocal idx
        shape = (cout, 1, k, k) if depthwise else (cout, cin, k, k)
        state[f"features.{idx}.conv.weight"] = torch.from_numpy(
            r.normal(0, 0.05, shape).astype(np.float32))
        bn_c = cout
        state[f"features.{idx}.bn.weight"] = torch.ones(bn_c)
        state[f"features.{idx}.bn.bias"] = torch.zeros(bn_c)
        state[f"features.{idx}.bn.running_mean"] = torch.zeros(bn_c)
        state[f"features.{idx}.bn.running_var"] = torch.ones(bn_c)
        idx += 1

    put(32, 3, 3)
    cin = 32
    for (stride, cout) in MB_BLOCKS:
        put(cin, cin, 3, depthwise=True)
        put(cout, cin, 1)
        cin = cout
    state["classifier.weight"] = torch.from_numpy(
        r.normal(0, 0.05, (10, 1024)).astype(np.float32))
    state["classifier.bias"] = torch.zeros(10)

    src = str(tmp_path / "nima.pth")
    dst = str(tmp_path / "nima.npz")
    torch.save(state, src)
    res = _run("convert_nima.py", src, dst)
    assert res.returncode == 0, res.stderr[-1500:]
    params = load_params(dst)
    import jax.numpy as jnp
    s = float(nima_score(params, jnp.zeros((64, 64, 3)),
                         compute_dtype="float32"))
    assert 1.0 <= s <= 10.0


def test_assets_status():
    from dpst_tpu.utils import assets
    st = assets.status()
    assert set(st) == {"vgg19", "pspnet50_ade20k", "nima_mobilenet"}
    for info in st.values():
        assert "path" in info and "available" in info
