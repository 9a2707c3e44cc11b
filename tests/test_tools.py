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


def _synth_vgg_state(seed=0):
    from dpst_tpu.models.vgg import CONV_SHAPES
    from tools.convert_vgg import TORCHVISION_IDX

    r = np.random.default_rng(seed)
    state = {}
    for (name, (cin, cout)), idx in zip(CONV_SHAPES.items(),
                                        TORCHVISION_IDX):
        state[f"features.{idx}.weight"] = torch.from_numpy(
            r.normal(0, 0.05, (cout, cin, 3, 3)).astype(np.float32))
        state[f"features.{idx}.bias"] = torch.from_numpy(
            r.normal(0, 0.05, cout).astype(np.float32))
    return state


def test_convert_vgg_roundtrip(tmp_path):
    from dpst_tpu.models.vgg import extract_features, load_params

    state = _synth_vgg_state()
    src = str(tmp_path / "vgg19.pth")
    dst = str(tmp_path / "vgg19.npz")
    torch.save(state, src)

    res = _run("convert_vgg.py", src, dst)
    assert res.returncode == 0, res.stderr[-1500:]
    params = load_params(dst)
    # OIHW -> HWIO transpose is exact for all layers but conv1_1 (which
    # absorbs the torchvision preprocessing fold)
    w_src = state["features.2.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(params["conv1_2"]["w"]),
                                  w_src)
    # loaded params run
    import jax.numpy as jnp
    feats = extract_features(
        params, jnp.zeros((16, 16, 3)), ("conv1_1",),
        compute_dtype="float32")
    assert feats["conv1_1"].shape == (16, 16, 64)


def test_convert_vgg_torchvision_fold_exact(tmp_path):
    """Pipeline activations with the converted bundle == torchvision
    activations with torchvision preprocessing (ADVICE r1 medium).

    Torch side: t = (rgb/255 - mean)/std, plain convs. Our side: the
    pipeline's Caffe preprocessing (BGR, mean-subtracted [0,255]) with
    conv1_1 carrying the folded normalization. Checked through a pool
    (conv2_1) so downstream layers are covered by induction.
    """
    import torch.nn.functional as F

    from dpst_tpu.models.vgg import extract_features, load_params
    from tools.convert_vgg import TV_MEAN, TV_STD

    state = _synth_vgg_state(seed=3)
    src = str(tmp_path / "vgg19.pth")
    dst = str(tmp_path / "vgg19.npz")
    torch.save(state, src)
    res = _run("convert_vgg.py", src, dst, "--convention", "torchvision")
    assert res.returncode == 0, res.stderr[-1500:]
    params = load_params(dst)

    r = np.random.default_rng(7)
    img = r.uniform(0, 255, (16, 16, 3)).astype(np.float32)

    # torchvision-convention forward in torch (fp64)
    t = torch.from_numpy(img[None]).permute(0, 3, 1, 2).double() / 255.0
    mean = torch.tensor(TV_MEAN, dtype=torch.float64).view(1, 3, 1, 1)
    std = torch.tensor(TV_STD, dtype=torch.float64).view(1, 3, 1, 1)
    t = (t - mean) / std
    theirs = {}
    for tv_idx, name in ((0, "conv1_1"), (2, "conv1_2"),
                         (None, "pool1"), (5, "conv2_1")):
        if name == "pool1":
            t = F.max_pool2d(t, 2, 2)
            continue
        w = state[f"features.{tv_idx}.weight"].double()
        b = state[f"features.{tv_idx}.bias"].double()
        t = F.relu(F.conv2d(t, w, b, padding=1))
        theirs[name] = t[0].permute(1, 2, 0).numpy()

    ours = extract_features(params, img, ("conv1_1", "conv2_1"),
                            compute_dtype="float32")
    # Interior pixels are EXACT (up to fp32). Border rings carry an
    # inherent ~0.009/std padding-convention residual: torch zero-pads
    # the normalized input (≙ RGB padded with the torchvision mean
    # pixel) while this pipeline zero-pads the Caffe mean-subtracted
    # input (≙ Caffe mean pixel) — no weight fold can reconcile the two.
    for layer, ring in (("conv1_1", 1), ("conv2_1", 2)):
        a, b = np.asarray(ours[layer]), theirs[layer]
        np.testing.assert_allclose(
            a[ring:-ring, ring:-ring], b[ring:-ring, ring:-ring],
            rtol=2e-4, atol=2e-5, err_msg=f"{layer} interior")
        np.testing.assert_allclose(a, b, atol=2e-2,
                                   err_msg=f"{layer} border ring")


def test_convert_vgg_caffe_convention(tmp_path):
    """--convention caffe is a pure layout transpose (no flip/scale)."""
    from dpst_tpu.models.vgg import load_params

    state = _synth_vgg_state(seed=5)
    src = str(tmp_path / "vgg19.pth")
    dst = str(tmp_path / "vgg19.npz")
    torch.save(state, src)
    res = _run("convert_vgg.py", src, dst, "--convention", "caffe")
    assert res.returncode == 0, res.stderr[-1500:]
    params = load_params(dst)
    w_c11 = state["features.0.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(params["conv1_1"]["w"]),
                                  w_c11)
    np.testing.assert_array_equal(
        np.asarray(params["conv1_1"]["b"]),
        state["features.0.bias"].numpy())


def test_convert_pspnet_roundtrip(tmp_path):
    """Converter accepts the REAL semseg key layout (hard-coded in
    reference_layouts.py, independent of build_key_map — the round-1
    fixture was circular) and tolerates the aux-head extras."""
    from dpst_tpu.models.pspnet import load_params, segment
    from reference_layouts import semseg_pspnet_state

    state = semseg_pspnet_state(seed=1)
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
    assert set(st) == {"vgg19", "pspnet50_ade20k", "nima_mobilenet",
                       "similarity_matrix"}
    for info in st.values():
        assert "path" in info and "available" in info


def test_make_similarity_matrix(tmp_path):
    """Embedding-asset builder: GloVe-text vectors -> valid 150x150
    matrix the semantic_merge loader accepts; related labels score
    high, labels with no known tokens stay isolated."""
    import numpy as np
    from dpst_tpu import semantic_merge as sm

    # tiny synthetic vector file: water-ish words cluster, tree apart
    rng = np.random.default_rng(0)
    base_water = rng.normal(size=8)
    vecs = {
        "water": base_water + rng.normal(0, 0.05, 8),
        "sea": base_water + rng.normal(0, 0.05, 8),
        "river": base_water + rng.normal(0, 0.05, 8),
        "tree": rng.normal(size=8),
        "sky": rng.normal(size=8),
    }
    src = tmp_path / "vectors.txt"
    with open(src, "w") as f:
        for tok, v in vecs.items():
            f.write(tok + " " + " ".join(f"{x:.6f}" for x in v) + "\n")
    dst = str(tmp_path / "similarity_matrix.npz")
    res = _run("make_similarity_matrix.py", str(src), dst)
    assert res.returncode == 0, res.stderr[-1500:]

    sim = np.load(dst)["similarity"]
    assert sim.shape == (150, 150)
    np.testing.assert_allclose(sim, sim.T, atol=1e-6)
    names = [lbl.split("|")[0] for lbl in sm.ADE20K_LABELS]
    i_water, i_sea, i_tree = (names.index("water"), names.index("sea"),
                              names.index("tree"))
    assert sim[i_water, i_sea] > 0.9          # embedded cluster
    assert sim[i_water, i_tree] < sim[i_water, i_sea]
    i_wall = names.index("wall")              # no vector in the file
    assert sim[i_wall, i_water] == 0.0 and sim[i_wall, i_wall] == 1.0

    # the loader accepts it end to end
    os.environ["DPST_SIMILARITY_MATRIX"] = dst
    try:
        s = sm.similarity_matrix("embedding")
        assert s.shape == (150, 150)
    finally:
        del os.environ["DPST_SIMILARITY_MATRIX"]


def test_verify_bundle_tool(tmp_path):
    """verify_bundle passes converted synthetic checkpoints and fails
    structurally-broken bundles."""
    from reference_layouts import keras_nima_arrays, write_keras_h5

    # valid NIMA bundle via the real converter path
    h5 = str(tmp_path / "mobilenet_weights.h5")
    npz = str(tmp_path / "nima.npz")
    write_keras_h5(h5, keras_nima_arrays(seed=4))
    assert _run("convert_nima.py", h5, npz).returncode == 0
    res = _run("verify_bundle.py", "nima", npz)
    assert res.returncode == 0, res.stdout + res.stderr[-800:]
    assert "OK" in res.stdout

    # corrupt it: wrong head shape
    data = dict(np.load(npz))
    data["head_w"] = data["head_w"][:512]
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, **data)
    res = _run("verify_bundle.py", "nima", bad)
    assert res.returncode == 1
    assert "FAIL" in res.stdout

    # vgg: converted synthetic torchvision checkpoint passes
    state = _synth_vgg_state(seed=6)
    src = str(tmp_path / "vgg19.pth")
    vnpz = str(tmp_path / "vgg19.npz")
    torch.save(state, src)
    assert _run("convert_vgg.py", src, vnpz).returncode == 0
    res = _run("verify_bundle.py", "vgg19", vnpz)
    assert res.returncode == 0, res.stdout + res.stderr[-800:]
