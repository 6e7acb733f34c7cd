"""Serving layer (sdm_tpu/serving): compile-once engine + HTTP micro-batching.

No reference counterpart (its generators are one-shot batch CLIs); the pin
here is internal consistency: the engine must reproduce the batch generator
CLI bit-for-bit at the compiled batch size, request outputs must be
independent of how requests were coalesced (DDIM determinism contract), and
the server must actually coalesce concurrent requests into fewer device
batches."""

import base64
import json
import threading
import urllib.error
import urllib.request

import os

import numpy as np
import pytest
import torch

from sdm_tpu.serving import SamplerEngine
from tests.test_extensions import _export_bundle_with_ema
from tests.test_generation import MODEL_CFG, _train_cfg, REF


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serving_bundle")
    cfg_plain, _ = _export_bundle_with_ema(tmp)
    cfg_cond, _ = _export_bundle_with_ema(tmp_path_factory.mktemp("cond"),
                                          cond_dim=2)
    return cfg_plain, cfg_cond


@pytest.fixture(scope="module")
def cold_sr_bundles(tmp_path_factory):
    from sdm_tpu.cli.export_models import export_bundle
    tmp = tmp_path_factory.mktemp("cold_sr")

    def save_net(name, seed, in_ch):
        torch.manual_seed(seed)
        net = REF.U_Net(
            in_channel=in_ch, out_channel=3, num_layers=2,
            num_resnet_blocks=1, attn_layers=[1], num_heads=1,
            dim_per_head=None, time_dim=16, cond_dim=None, min_channel=32,
            max_channel=64, image_recon=True)
        path = str(tmp / name)
        torch.save({"model": net.state_dict()}, path)
        return path

    # 2-model cold ensemble (chaining exercises the re-degrade step).
    cold = export_bundle(
        "cold", str(tmp), img_c=3, img_h=16, img_w=16,
        model_type="BASE-COLD",
        entries=[(_train_cfg(6, 10, img_recon=True), save_net("c1.pt", 10, 3)),
                 (_train_cfg(1, 5, img_recon=True), save_net("c2.pt", 11, 3))])
    sr = export_bundle(
        "sr", str(tmp), img_c=3, img_h=16, img_w=16, model_type="SR",
        entries=[(dict(_train_cfg(1, 10, img_recon=True), in_channel=6,
                       cond_t=5), save_net("sr.pt", 12, 6))])
    return (os.path.join(cold, "config.json"),
            os.path.join(sr, "config.json"))


def _engine(cfg, **kw):
    kw.setdefault("diff_alg", "ddim")
    kw.setdefault("step_size", 4)
    kw.setdefault("max_T", 10)
    kw.setdefault("max_batch", 4)
    return SamplerEngine(cfg, log=lambda *a, **k: None, **kw)


# ---------------------------------------------------------------- engine

def test_engine_matches_generator_cli(bundle):
    from sdm_tpu.cli.generate_images_diffusion import generate_images_diffusion
    cfg, _ = bundle
    eng = _engine(cfg)
    got = eng.generate(4, seed=7)
    want = generate_images_diffusion(
        ["-c", cfg, "-n", "4", "-s", "7", "--diff_alg", "ddim",
         "--ddim_step_size", "4", "-T", "10"], save_locally=False)
    assert got.shape == want.shape == (4, 16, 16, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_engine_coalescing_is_seed_deterministic(bundle):
    cfg, _ = bundle
    eng = _engine(cfg)
    alone = eng.generate(2, seed=7)
    a, b = eng.generate_batch([
        dict(num_images=2, seed=7, labels=None, guidance_scale=1.0),
        dict(num_images=1, seed=9, labels=None, guidance_scale=1.0)])
    # DDIM (eta=0): each image is a pure function of its own noise, so
    # coalescing and padding must not change request outputs.
    np.testing.assert_allclose(a, alone, rtol=1e-5, atol=1e-5)
    assert b.shape == (1, 16, 16, 3)
    assert np.abs(b - alone[:1]).max() > 1e-3  # different seed differs


def test_engine_validation(bundle):
    cfg_plain, cfg_cond = bundle
    eng = _engine(cfg_plain)
    with pytest.raises(ValueError, match="exceeds max_batch"):
        eng.generate(5)
    with pytest.raises(ValueError, match="without guidance=True"):
        eng.generate(1, guidance_scale=3.0)
    with pytest.raises(ValueError, match="share guidance_scale"):
        eng.generate_batch([
            dict(num_images=1, seed=0, labels=None, guidance_scale=1.0),
            dict(num_images=1, seed=0, labels=None, guidance_scale=2.0)])
    cond = _engine(cfg_cond)
    with pytest.raises(ValueError, match="labels per request"):
        cond.generate(1)
    with pytest.raises(ValueError, match="needs a label-conditional"):
        _engine(cfg_plain, guidance=True)
    with pytest.raises(ValueError, match="ddim/ddpm/cold"):
        _engine(cfg_plain, diff_alg="euler")
    with pytest.raises(ValueError, match="supported for eps"):
        _engine(cfg_cond, diff_alg="cold", guidance=True)


def test_engine_guidance_traced_scale(bundle):
    _, cfg_cond = bundle
    plain = _engine(cfg_cond)
    guided = _engine(cfg_cond, guidance=True)
    lab = [1.0, 0.0]
    base = plain.generate(2, seed=3, labels=lab)
    # scale 1.0 through the guided (doubled-batch) program == plain branch.
    g1 = guided.generate(2, seed=3, labels=lab, guidance_scale=1.0)
    np.testing.assert_allclose(g1, base, rtol=1e-4, atol=1e-4)
    # Different scales through the SAME engine (no recompile needed — the
    # scale is a traced scalar) and they must actually steer the output.
    g3 = guided.generate(2, seed=3, labels=lab, guidance_scale=3.0)
    assert np.abs(g3 - base).max() > 1e-4


def test_engine_ddpm_runs(bundle):
    cfg, _ = bundle
    eng = _engine(cfg, diff_alg="ddpm")
    out = eng.generate(3, seed=1)
    assert out.shape == (3, 16, 16, 3)
    np.testing.assert_allclose(out, eng.generate(3, seed=1),
                               rtol=1e-5, atol=1e-5)  # same batch composition


def test_engine_precompile_resets_stats(bundle):
    cfg, _ = bundle
    eng = _engine(cfg)
    dt = eng.precompile()
    snap = eng.stats.snapshot()
    assert dt > 0 and snap["compile_seconds"] > 0
    assert snap["batches"] == snap["images"] == 0
    eng.generate(1, seed=0)
    snap = eng.stats.snapshot()
    assert snap["batches"] == 1 and snap["images"] == 1
    assert snap["padded_images"] == 3


def test_engine_cold_matches_generator_cli(cold_sr_bundles):
    from sdm_tpu.cli.generate_images_cold_diffusion import (
        generate_images_cold_diffusion)
    cold_cfg, _ = cold_sr_bundles
    eng = _engine(cold_cfg, diff_alg="cold")
    assert eng.kind == "cold"
    got = eng.generate(4, seed=11)
    want = generate_images_cold_diffusion(
        ["-c", cold_cfg, "-n", "4", "-s", "11", "--cold_step_size", "4",
         "-T", "10"], log=lambda *a, **k: None, save_locally=False)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # Cold trajectories are noise-deterministic: coalescing-invariant too.
    alone = eng.generate(2, seed=11)
    coalesced = eng.generate_batch([
        dict(num_images=2, seed=11, labels=None, guidance_scale=1.0,
             lr_image=None),
        dict(num_images=2, seed=5, labels=None, guidance_scale=1.0,
             lr_image=None)])[0]
    np.testing.assert_allclose(alone, coalesced, rtol=1e-5, atol=1e-5)


def test_engine_sr_matches_generator_cli(cold_sr_bundles):
    from sdm_tpu.cli.generate_sr_images_diffusion import (
        generate_sr_images_diffusion)
    _, sr_cfg = cold_sr_bundles
    eng = _engine(sr_cfg)  # diff_alg auto-forced to cold for SR bundles
    assert eng.kind == "sr" and eng.diff_alg == "cold"
    rng = np.random.default_rng(5)
    lr_u8 = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    lr = (lr_u8.astype(np.float32) - 127.5) / 127.5
    got = eng.generate(1, seed=9, lr_image=lr)
    want = generate_sr_images_diffusion(
        ["-c", sr_cfg, "-s", "9", "--cold_step_size", "4", "-T", "10"],
        log=lambda *a, **k: None, lr_img=lr_u8, save_locally=False)
    assert got.shape == want.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_engine_sr_validation(cold_sr_bundles):
    _, sr_cfg = cold_sr_bundles
    eng = _engine(sr_cfg)
    with pytest.raises(ValueError, match="need lr_image"):
        eng.generate(1, seed=0)
    with pytest.raises(ValueError, match="exceeds the model's output"):
        eng.generate(1, seed=0,
                     lr_image=np.zeros((32, 32, 3), np.float32))
    # Unconditional SR bundle: the label-conditional check fires first.
    with pytest.raises(ValueError, match="label-conditional"):
        _engine(sr_cfg, guidance=True)


# ---------------------------------------------------------------- server

def _post(url, payload, timeout=120):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def server(bundle):
    from sdm_tpu.cli.serve_diffusion import serve_diffusion
    cfg, _ = bundle
    srv = serve_diffusion(
        ["-c", cfg, "--port", "0", "--diff_alg", "ddim",
         "--ddim_step_size", "4", "-T", "10", "--max-batch", "4",
         "--batch-wait-ms", "300"],
        log=lambda *a, **k: None, block=False)
    yield f"http://{srv.host}:{srv.port}", srv
    srv.stop()


def test_server_healthz_and_generate(server):
    url, _ = server
    health = _get(url + "/healthz")
    assert health["status"] == "ok"
    assert health["img_shape"] == [16, 16, 3]
    assert health["max_batch"] == 4

    resp = _post(url + "/generate", {"num_images": 2, "seed": 5})
    arr = np.frombuffer(base64.b64decode(resp["data_b64"]),
                        np.float32).reshape(resp["shape"])
    assert arr.shape == (2, 16, 16, 3)
    assert np.isfinite(arr).all() and np.abs(arr).max() > 1e-3
    # Same seed reproduces (DDIM determinism through the whole stack).
    resp2 = _post(url + "/generate", {"num_images": 2, "seed": 5})
    assert resp2["data_b64"] == resp["data_b64"]


def test_server_png_format(server):
    import cv2
    url, _ = server
    resp = _post(url + "/generate",
                 {"num_images": 1, "seed": 1, "format": "png"})
    png = base64.b64decode(resp["images_b64"][0])
    img = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8


def test_server_coalesces_concurrent_requests(server):
    url, srv = server
    before = srv.engine.stats.snapshot()["batches"]
    results = [None] * 3
    errs = []

    def worker(i):
        try:
            results[i] = _post(url + "/generate",
                               {"num_images": 1, "seed": 100 + i})
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert not errs and all(r is not None for r in results)
    after = srv.engine.stats.snapshot()["batches"]
    # 3 concurrent 1-image requests (wait window 300ms) must run in fewer
    # than 3 device batches.
    assert after - before < 3
    # Distinct seeds -> distinct images.
    assert len({r["data_b64"] for r in results}) == 3


def test_server_rejects_bad_requests(server):
    url, _ = server
    for payload in ({"num_images": 99}, {"num_images": 0},
                    {"guidance_scale": 2.0}, {"format": "gif"}):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url + "/generate", payload)
        assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(url + "/nope")
    assert ei.value.code == 404


def test_server_sr_bundle(cold_sr_bundles):
    import cv2
    from sdm_tpu.cli.serve_diffusion import serve_diffusion
    _, sr_cfg = cold_sr_bundles
    srv = serve_diffusion(
        ["-c", sr_cfg, "--port", "0", "--cold_step_size", "4", "-T", "10",
         "--max-batch", "2", "--no-precompile"],
        log=lambda *a, **k: None, block=False)
    url = f"http://{srv.host}:{srv.port}"
    try:
        assert _get(url + "/healthz")["kind"] == "sr"
        rng = np.random.default_rng(0)
        lr_u8 = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        ok, png = cv2.imencode(".png", lr_u8)
        assert ok
        resp = _post(url + "/generate", {
            "num_images": 1, "seed": 3,
            "lr_image_png_b64": base64.b64encode(bytes(png)).decode()})
        arr = np.frombuffer(base64.b64decode(resp["data_b64"]),
                            np.float32).reshape(resp["shape"])
        assert arr.shape == (1, 16, 16, 3) and np.isfinite(arr).all()
        # Raw-float variant must agree exactly (same decoded pixels).
        lr = ((lr_u8.astype(np.float32) - 127.5) / 127.5)
        resp2 = _post(url + "/generate", {
            "num_images": 1, "seed": 3,
            "lr_image_b64": base64.b64encode(
                np.ascontiguousarray(lr).tobytes()).decode(),
            "lr_shape": [8, 8, 3]})
        assert resp2["data_b64"] == resp["data_b64"]
        # Missing lr input -> 400.
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url + "/generate", {"num_images": 1})
        assert ei.value.code == 400
    finally:
        srv.stop()


def test_server_stats_endpoint(server):
    url, _ = server
    stats = _get(url + "/stats")
    assert stats["requests_served"] >= 1
    assert stats["batches"] >= 1
    assert "device_seconds" in stats and "compile_seconds" in stats


def test_engine_pipelined_matches_sequential(bundle):
    """dispatch/finalize pipelining (host fetch of batch k overlapping
    batch k+1's device work) must be a pure scheduling change: outputs are
    bit-identical to sequential generate_batch, in order."""
    cfg, _ = bundle
    eng = _engine(cfg)
    batches = [[dict(num_images=3, seed=s, labels=None, guidance_scale=1.0)]
               for s in (1, 2, 3, 4)]
    want = [eng.generate_batch(b) for b in batches]
    got = eng.generate_pipelined(batches, depth=2)
    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g[0], w[0])
    # Mixed single-fused and coalesced flexible batches pipeline too.
    mixed = [
        [dict(num_images=4, seed=9, labels=None, guidance_scale=1.0)],
        [dict(num_images=2, seed=7, labels=None, guidance_scale=1.0),
         dict(num_images=1, seed=9, labels=None, guidance_scale=1.0)],
    ]
    want2 = [eng.generate_batch(b) for b in mixed]
    got2 = eng.generate_pipelined(mixed, depth=2)
    for g, w in zip(got2, want2):
        for gi, wi in zip(g, w):
            np.testing.assert_array_equal(gi, wi)


def test_engine_data_parallel_matches_single_device(bundle):
    """num_devices > 1 shards the padded batch over the data mesh (engine
    analogue of the generators' --num-devices): outputs must match the
    single-device engine, and the dispatched result must actually live on
    all requested devices. Runs on the conftest's 8 virtual CPU devices."""
    cfg, _ = bundle
    single = _engine(cfg)
    sharded = _engine(cfg, num_devices=4)

    want = single.generate(4, seed=7)
    got = sharded.generate(4, seed=7)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    handle = sharded.dispatch(
        [dict(num_images=4, seed=7, labels=None, guidance_scale=1.0)])
    assert len(handle["out"].sharding.device_set) == 4
    sharded.finalize(handle)

    # Coalesced (flexible-path) batches shard too.
    a, b = sharded.generate_batch([
        dict(num_images=2, seed=7, labels=None, guidance_scale=1.0),
        dict(num_images=1, seed=9, labels=None, guidance_scale=1.0)])
    np.testing.assert_allclose(a, want[:2], rtol=1e-6, atol=1e-6)
    assert b.shape == (1, 16, 16, 3)


def test_engine_uint8_output_matches_host_quantization(bundle):
    """output_dtype='uint8' quantizes on device with exactly the png
    writer's math: equal to host-side quantization of the float engine's
    output, on both the fused and coalesced paths."""
    cfg, _ = bundle
    f32 = _engine(cfg)
    u8 = _engine(cfg, output_dtype="uint8")

    want = np.clip((f32.generate(4, seed=7) + 1.0) * 127.5,
                   0, 255).astype(np.uint8)
    got = u8.generate(4, seed=7)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)

    a, b = u8.generate_batch([
        dict(num_images=2, seed=7, labels=None, guidance_scale=1.0),
        dict(num_images=1, seed=9, labels=None, guidance_scale=1.0)])
    assert a.dtype == b.dtype == np.uint8
    np.testing.assert_array_equal(a, want[:2])
