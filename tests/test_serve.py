"""Serving subsystem tests: dynamic batcher, engine, stage-2 service,
HTTP front end. The reference has no serving layer (its inference
surface is offline batch-test scripts); these tests pin the behavior the
serving stack promises — bucketed static shapes, request/response
routing, failure isolation, and the per-request determinism contract
(serve/stage2.py docstring)."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdms_tpu.serve.engine import (
    DynamicBatcher, EngineClosed, InferenceEngine,
)


def wait_until(pred, timeout=10.0, poll=0.01):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(poll)
    return False


class TestEngine:
    def test_roundtrip_and_routing(self):
        """Each request's result is its own row, whatever the batch mix."""
        batches = []

        def fn(batch):
            batches.append(batch["x"].shape[0])
            return {"y": batch["x"] * 2.0}

        with InferenceEngine(fn, buckets=(1, 2, 4),
                             max_delay_ms=100.0) as eng:
            futs = [eng.submit({"x": np.full((3,), float(i))})
                    for i in range(3)]
            for i, f in enumerate(futs):
                np.testing.assert_array_equal(f.result(30)["y"],
                                              np.full((3,), 2.0 * i))
        # every processed batch used a configured bucket size
        assert set(batches) <= {1, 2, 4}

    def test_bucket_padding(self):
        """3 requests in one window -> bucket 4 with one padded slot."""
        sizes = []
        entered = threading.Event()
        release = threading.Event()

        def fn(batch):
            entered.set()
            release.wait(30)
            sizes.append(batch["x"].shape[0])
            return batch["x"]

        eng = InferenceEngine(fn, buckets=(1, 4), max_delay_ms=500.0)
        try:
            # first submit occupies the dispatch thread (blocked on the
            # event inside its own batch), the next three queue into one
            # shared window
            f0 = eng.submit({"x": np.zeros(2)})
            assert entered.wait(10)
            futs = [eng.submit({"x": np.full(2, float(i))})
                    for i in range(3)]
            release.set()
            [f.result(30) for f in [f0] + futs]
        finally:
            eng.close()
        assert sizes[-1] == 4                       # 3 real + 1 pad
        st = eng.stats()
        assert st["completed"] == 4
        assert st["padded_slots"] >= 1
        assert 0 < st["batch_occupancy"] <= 1

    def test_error_isolation(self):
        """A failing batch fails its own futures; the engine keeps going."""
        def fn(batch):
            if batch["x"][0, 0] < 0:
                raise RuntimeError("boom")
            return batch["x"] + 1

        with InferenceEngine(fn, buckets=(1,), max_delay_ms=1.0) as eng:
            bad = eng.submit({"x": np.full((1,), -1.0)})
            with pytest.raises(RuntimeError, match="boom"):
                bad.result(30)
            good = eng.submit({"x": np.full((1,), 5.0)})
            np.testing.assert_array_equal(good.result(30), [6.0])
        assert eng.stats()["failed"] == 1

    def test_close_drains_queued_requests(self):
        def fn(batch):
            time.sleep(0.01)
            return batch["x"]

        eng = InferenceEngine(fn, buckets=(2,), max_delay_ms=1.0)
        futs = [eng.submit({"x": np.full(1, float(i))}) for i in range(6)]
        eng.close(drain=True)
        for i, f in enumerate(futs):
            np.testing.assert_array_equal(f.result(1), [float(i)])

    def test_close_no_drain_fails_queued(self):
        release = threading.Event()

        def fn(batch):
            release.wait(30)
            return batch["x"]

        eng = InferenceEngine(fn, buckets=(1,), max_delay_ms=1.0)
        first = eng.submit({"x": np.zeros(1)})
        # wait until the dispatch thread holds `first` (queue empty)
        assert wait_until(lambda: eng._batcher.pending() == 0, 5)
        queued = eng.submit({"x": np.ones(1)})
        closer = threading.Thread(target=eng.close,
                                  kwargs={"drain": False})
        closer.start()
        release.set()
        closer.join(30)
        np.testing.assert_array_equal(first.result(1), [0.0])
        with pytest.raises(EngineClosed):
            queued.result(1)

    def test_pipelined_dispatch(self):
        """The dispatch thread must dispatch batch N+1 while batch N's
        result is still being materialized (device kept busy during
        readback): batch_fn returns a lazy object whose host
        materialization blocks, and a second batch_fn call must happen
        before the first future resolves."""
        gate = threading.Event()
        calls = []

        class LazyResult:
            def __init__(self, arr):
                self.arr = arr

            def __array__(self, dtype=None, copy=None):
                gate.wait(30)
                return self.arr

        def fn(batch):
            calls.append(batch["x"].shape[0])
            return LazyResult(batch["x"] + 1)

        eng = InferenceEngine(fn, buckets=(1,), max_delay_ms=1.0,
                              max_inflight=2)
        try:
            f1 = eng.submit({"x": np.zeros(1)})
            f2 = eng.submit({"x": np.ones(1)})
            # second dispatch happens while the first result is stuck in
            # the completion thread
            assert wait_until(lambda: len(calls) == 2, 10), calls
            assert not f1.done()
            gate.set()
            np.testing.assert_array_equal(f1.result(30), [1.0])
            np.testing.assert_array_equal(f2.result(30), [2.0])
        finally:
            eng.close()

    def test_cancelled_future_is_skipped(self):
        """A client cancel() on a queued request must not kill the
        dispatch thread (set_result on a cancelled future raises)."""
        release = threading.Event()

        def fn(batch):
            release.wait(30)
            return batch["x"]

        eng = InferenceEngine(fn, buckets=(1,), max_delay_ms=1.0)
        try:
            first = eng.submit({"x": np.zeros(1)})
            assert wait_until(lambda: eng._batcher.pending() == 0, 5)
            second = eng.submit({"x": np.ones(1)})
            assert second.cancel()
            release.set()
            np.testing.assert_array_equal(first.result(30), [0.0])
            third = eng.submit({"x": np.full(1, 3.0)})
            np.testing.assert_array_equal(third.result(30), [3.0])
            assert wait_until(
                lambda: eng.stats()["cancelled"] == 1, 5), eng.stats()
        finally:
            eng.close()

    def test_submit_after_close_raises(self):
        eng = InferenceEngine(lambda b: b["x"], buckets=(1,))
        eng.close()
        with pytest.raises(EngineClosed):
            eng.submit({"x": np.zeros(1)})

    def test_warmup_runs_every_bucket(self):
        sizes = []

        def fn(batch):
            sizes.append(batch["x"].shape[0])
            return batch["x"]

        with InferenceEngine(fn, buckets=(1, 2, 8)) as eng:
            eng.warmup({"x": np.zeros(3)})
        assert sizes[:3] == [1, 2, 8]

    def test_batcher_window(self):
        b = DynamicBatcher(max_batch=4, max_delay_s=0.05)
        assert b.collect(poll_s=0.01) == []
        from pcdms_tpu.serve.engine import _Pending
        from concurrent.futures import Future
        for i in range(6):
            b.put(_Pending({"i": np.asarray(i)}, Future(),
                           time.monotonic()))
        got = b.collect()
        assert len(got) == 4                       # capped at max_batch
        assert len(b.collect()) == 2               # remainder


# ---- tiny stage-2 service (CPU) ----

from pcdms_tpu.models.projections import (            # noqa: E402
    image_proj_mlp_init, pose_cond_embedding_init,
)
from pcdms_tpu.models.unet2d import UNetConfig, unet_init  # noqa: E402
from pcdms_tpu.models.vae import VAEConfig, vae_init       # noqa: E402

UNET2_CFG = UNetConfig(in_channels=9, block_out_channels=(8, 16, 16, 16),
                       layers_per_block=1, cross_attention_dim=16,
                       head_dim=8, class_embed_proj_dim=16, norm_groups=4,
                       use_flash=False)
VAE_CFG = VAEConfig(block_out_channels=(4, 8, 8, 8), layers_per_block=1,
                    norm_groups=2)
H = W = 64
DINO_SHAPE = (5, 24)


@pytest.fixture(scope="module")
def s2_params():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return {
        "unet": unet_init(ks[0], UNET2_CFG),
        "image_proj": image_proj_mlp_init(ks[1], 24, 16, 16),
        "pose_proj": pose_cond_embedding_init(
            ks[2], out_channels=8, block_out_channels=(4, 4, 4, 4)),
        "vae": vae_init(ks[3], VAE_CFG),
    }


def make_service(s2_params, **kw):
    from pcdms_tpu.serve.stage2 import Stage2Service
    args = dict(unet_cfg=UNET2_CFG, vae_cfg=VAE_CFG, height=H, width=W,
                num_steps=2, guidance_scale=2.0, scheduler="unipc",
                compute_dtype=jnp.float32, dino_tokens=DINO_SHAPE[0],
                dino_dim=DINO_SHAPE[1], embed_dim=16,
                buckets=(1, 2, 4), max_delay_ms=30.0)
    args.update(kw)
    return Stage2Service(s2_params, **args)


def request_inputs(i, seed=0):
    rng = np.random.default_rng(100 + i)
    return dict(
        vae_image=rng.uniform(-1, 1, (H, 2 * W, 3)).astype(np.float32),
        st_pose=rng.uniform(-1, 1, (H, 2 * W, 3)).astype(np.float32),
        dino_features=rng.normal(size=DINO_SHAPE).astype(np.float32),
        embed=rng.normal(size=(16,)).astype(np.float32),
        seed=seed,
    )


class TestStage2Service:
    pytestmark = pytest.mark.slow
    def test_batch_invariance(self, s2_params):
        """The determinism contract: a request's output is identical
        whether it runs alone (bucket 1) or packed with other requests
        (bucket 4) — per-request latents + deterministic VAE + UniPC."""
        svc = make_service(s2_params)
        try:
            fn = svc.engine._batch_fn

            def pack(reqs):
                batch = {
                    "vae_image": np.stack([r["vae_image"] for r in reqs]),
                    "st_pose": np.stack([r["st_pose"] for r in reqs]),
                    "dino": np.stack([r["dino_features"] for r in reqs]),
                    "embed": np.stack([r["embed"] for r in reqs]),
                    "latents": np.stack([
                        np.random.default_rng(r["seed"]).standard_normal(
                            (H // 8, 2 * W // 8, 4), dtype=np.float32)
                        for r in reqs]),
                }
                return np.asarray(fn(batch))

            a, b, c, d = (request_inputs(i, seed=i) for i in range(4))
            alone = pack([a])
            packed = pack([b, a, c, d])
            np.testing.assert_allclose(packed[1], alone[0],
                                       rtol=1e-5, atol=1e-5)
        finally:
            svc.close()

    def test_submit_end_to_end(self, s2_params):
        svc = make_service(s2_params)
        try:
            reqs = [request_inputs(i, seed=i) for i in range(3)]
            futs = [svc.submit(**r) for r in reqs]
            imgs = [f.result(120) for f in futs]
            for img in imgs:
                assert img.shape == (H, 2 * W, 3)
                assert np.isfinite(img).all()
            # same request again (possibly different batch mix) -> same
            again = svc.submit(**reqs[0]).result(120)
            np.testing.assert_allclose(again, imgs[0], rtol=1e-5,
                                       atol=1e-5)
            # a different seed changes the image
            other = svc.submit(**{**reqs[0], "seed": 99}).result(120)
            assert np.abs(other - imgs[0]).max() > 1e-3
            st = svc.stats()
            assert st["completed"] >= 5 and st["failed"] == 0
        finally:
            svc.close()

    def test_mesh_sharded_serving_matches_unsharded(self, s2_params):
        """mesh= shards each device batch over the 8-device mesh (pure
        DP serving); results are identical to the unsharded service —
        and the bucket size must fill the mesh."""
        from pcdms_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
        with pytest.raises(ValueError, match="not divisible"):
            make_service(s2_params, mesh=mesh, buckets=(3,))

        reqs = [request_inputs(i, seed=i) for i in range(3)]
        svc = make_service(s2_params, mesh=mesh, buckets=(8,),
                           max_delay_ms=200.0)
        try:
            futs = [svc.submit(**r) for r in reqs]
            sharded = [f.result(300) for f in futs]
        finally:
            svc.close()
        svc = make_service(s2_params)
        try:
            plain = [svc.submit(**r).result(300) for r in reqs]
        finally:
            svc.close()
        for a, b in zip(sharded, plain):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_input_validation(self, s2_params):
        svc = make_service(s2_params)
        try:
            r = request_inputs(0)
            with pytest.raises(ValueError, match="vae_image"):
                svc.submit(**{**r, "vae_image": np.zeros((8, 8, 3))})
            with pytest.raises(ValueError, match="embed"):
                svc.submit(**{**r, "embed": None})
        finally:
            svc.close()

    def test_nondeterministic_scheduler_rejected(self, s2_params):
        """The determinism contract only holds for noise-free samplers;
        'lcm' draws batch-shaped ancestral noise from the batch rng, so
        the constructor must reject it (ADVICE r3)."""
        with pytest.raises(ValueError, match="determinism"):
            make_service(s2_params, scheduler="lcm")

        from pcdms_tpu.models.prior_transformer import PriorConfig
        from pcdms_tpu.serve.stage2 import CascadeService
        with pytest.raises(ValueError, match="determinism"):
            CascadeService(None, None, None, prior_cfg=PriorConfig(),
                           stage2_cfg=UNET2_CFG, stage3_cfg=UNET2_CFG,
                           scheduler="lcm")


class TestShapeRouter:
    """Serving shape policy: engines are compiled per (resolution, steps)
    configuration; a multi-resolution deployment routes by canvas shape
    and REJECTS out-of-policy shapes with ValueError -> HTTP 400 instead
    of recompiling (serve/router.py)."""

    def test_routes_by_canvas_and_rejects_unknown(self, s2_params):
        # second config = same height, 2x width (the tiny UNet's 3
        # downsample levels need latent height >= 8, i.e. image >= 64px)
        from pcdms_tpu.serve.router import ShapeRouter
        svc_wide = make_service(s2_params, height=H, width=2 * W)
        svc_std = make_service(s2_params, height=H, width=W)
        with ShapeRouter([svc_wide, svc_std]) as router:
            assert router.canvases == [(H, 2 * W), (H, 4 * W)]

            # standard request -> the (H, 2W)-canvas service
            std = request_inputs(0)
            out_std = np.asarray(router.submit(**std).result(60))
            assert out_std.shape == (H, 2 * W, 3)

            # wide request -> the (H, 4W)-canvas service
            wide = dict(std)
            rng = np.random.default_rng(0)
            wide["vae_image"] = rng.uniform(
                -1, 1, (H, 4 * W, 3)).astype(np.float32)
            wide["st_pose"] = rng.uniform(
                -1, 1, (H, 4 * W, 3)).astype(np.float32)
            out_wide = np.asarray(router.submit(**wide).result(60))
            assert out_wide.shape == (H, 4 * W, 3)

            # out-of-policy canvas: rejected by the ROUTER (no engine
            # ever sees it, nothing recompiles)
            bad = dict(std)
            bad["vae_image"] = np.zeros((48, 96, 3), np.float32)
            with pytest.raises(ValueError,
                               match="no service for canvas"):
                router.submit(**bad)

            st = router.stats()
            assert st[f"{H}x{4 * W}"]["completed"] == 1
            assert st[f"{H}x{2 * W}"]["completed"] == 1

    def test_duplicate_canvas_rejected(self, s2_params):
        """Two configs at one resolution (e.g. different step counts)
        cannot share a router — the canvas key would be ambiguous."""
        from pcdms_tpu.serve.router import ShapeRouter
        a = make_service(s2_params, num_steps=1)
        b = make_service(s2_params, num_steps=2)
        try:
            with pytest.raises(ValueError, match="duplicate service"):
                ShapeRouter([a, b])
        finally:
            a.close()
            b.close()


class TestServeCLI:
    pytestmark = pytest.mark.slow
    """build_service wires configs/params/services like the other CLIs'
    mains; drive it at tiny geometry for both models."""

    def _args(self, *extra):
        from pcdms_tpu.cli.serve import parse_args
        return parse_args([
            "--random_init", "--tiny_config", "--height", "64",
            "--width", "64", "--num_inference_steps", "2", "--no_warmup",
            "--buckets", "1", "2", *extra])

    def test_stage2_service(self):
        from pcdms_tpu.cli.serve import build_service
        svc = build_service(self._args("--model", "stage2"))
        try:
            r = request_inputs(0)
            img = svc.submit(**r).result(180)
            assert img.shape == (H, 2 * W, 3)
            assert np.isfinite(img).all()
        finally:
            svc.close()

    def test_cascade_service(self):
        from pcdms_tpu.cli.serve import build_service
        svc = build_service(self._args("--model", "cascade"))
        try:
            r = request_inputs(0)
            rng = np.random.default_rng(0)
            req = dict(
                s_embed=rng.normal(size=(16,)).astype(np.float32),
                s_pose=np.full((36,), 0.4, np.float32),
                t_pose=np.full((36,), 0.6, np.float32),
                vae_image=r["vae_image"], st_pose=r["st_pose"],
                dino_features=r["dino_features"])
            out = svc.submit(**req, seed=5).result(300)
            assert out["refined"].shape == (H, W, 3)
            assert out["inpainted"].shape == (H, 2 * W, 3)
            assert np.isfinite(out["refined"]).all()
            # same request + seed reproduces exactly; a different seed
            # gives a different trajectory (per-request determinism —
            # serve/stage2.py module docstring)
            again = svc.submit(**req, seed=5).result(300)
            np.testing.assert_array_equal(out["refined"], again["refined"])
            other = svc.submit(**req, seed=6).result(300)
            assert not np.allclose(out["refined"], other["refined"])
        finally:
            svc.close()

    def test_multi_canvas_deployment(self):
        """--canvas H W (repeatable) launches N pre-warmed engines
        sharing one parameter set behind a ShapeRouter + one HTTP port;
        out-of-policy shapes get HTTP 400, never a recompile
        (cli/serve.py build_deployment; VERDICT r4 #5)."""
        from pcdms_tpu.cli.serve import build_deployment
        from pcdms_tpu.serve.http import ServingServer, post_npz
        from pcdms_tpu.serve.router import ShapeRouter

        args = self._args("--model", "stage2",
                          "--canvas", "64", "64",
                          "--canvas", "64", "128")
        dep = build_deployment(args)
        assert isinstance(dep, ShapeRouter)
        assert dep.canvases == [(64, 128), (64, 256)]
        with ServingServer(dep, port=0) as server:
            std = request_inputs(0)
            out = post_npz("127.0.0.1", server.port, std, timeout=300)
            assert out["image"].shape == (64, 128, 3)

            wide = dict(std)
            rng = np.random.default_rng(1)
            wide["vae_image"] = rng.uniform(
                -1, 1, (64, 256, 3)).astype(np.float32)
            wide["st_pose"] = rng.uniform(
                -1, 1, (64, 256, 3)).astype(np.float32)
            out = post_npz("127.0.0.1", server.port, wide, timeout=300)
            assert out["image"].shape == (64, 256, 3)

            bad = dict(std)
            bad["vae_image"] = np.zeros((48, 96, 3), np.float32)
            with pytest.raises(RuntimeError, match="HTTP 400"):
                post_npz("127.0.0.1", server.port, bad, timeout=300)

    def test_seed_portable_across_services(self):
        """One seed derivation across --model flavors: feeding a
        cascade's predicted embedding to a stage-2 service with the
        SAME seed reproduces the cascade's stage-2 image
        (serve/stage2.py module docstring; VERDICT r4 #6)."""
        from pcdms_tpu.cli.serve import build_service
        r = request_inputs(0)
        rng = np.random.default_rng(0)
        seed = 7

        svc = build_service(self._args("--model", "cascade"))
        try:
            out = svc.submit(
                s_embed=rng.normal(size=(16,)).astype(np.float32),
                s_pose=np.full((36,), 0.4, np.float32),
                t_pose=np.full((36,), 0.6, np.float32),
                vae_image=r["vae_image"], st_pose=r["st_pose"],
                dino_features=r["dino_features"], seed=seed).result(300)
        finally:
            svc.close()

        svc = build_service(self._args("--model", "stage2"))
        try:
            img = svc.submit(
                vae_image=r["vae_image"], st_pose=r["st_pose"],
                dino_features=r["dino_features"],
                embed=np.asarray(out["embeds"]).ravel(),
                seed=seed).result(300)
        finally:
            svc.close()
        np.testing.assert_allclose(np.asarray(img),
                                   np.asarray(out["inpainted"]),
                                   rtol=1e-5, atol=1e-5)


class TestHTTP:
    def test_server_end_to_end(self, s2_params):
        from pcdms_tpu.serve.http import ServingServer, post_npz
        svc = make_service(s2_params)
        with ServingServer(svc, port=0) as server:
            port = server.port
            # health + stats
            import http.client
            import json
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
            conn.request("GET", "/healthz")
            assert json.loads(conn.getresponse().read()) == {"ok": True}
            conn.request("GET", "/stats")
            assert "completed" in json.loads(conn.getresponse().read())
            conn.close()

            # two concurrent generate requests batch through the engine
            reqs = [request_inputs(i, seed=i) for i in range(2)]
            outs = [None, None]

            def call(i):
                outs[i] = post_npz("127.0.0.1", port, reqs[i])

            ts = [threading.Thread(target=call, args=(i,))
                  for i in range(2)]
            [t.start() for t in ts]
            [t.join(120) for t in ts]
            for o in outs:
                assert o is not None and o["image"].shape == (H, 2 * W, 3)

            # malformed request -> 400, server stays alive
            with pytest.raises(RuntimeError, match="HTTP 400"):
                post_npz("127.0.0.1", port,
                         {**reqs[0], "vae_image": np.zeros((4, 4, 3),
                                                           np.float32)})
            ok = post_npz("127.0.0.1", port, reqs[0])
            assert ok["image"].shape == (H, 2 * W, 3)

    def test_body_size_limit(self, s2_params):
        from pcdms_tpu.serve.http import ServingServer, post_npz
        svc = make_service(s2_params)
        with ServingServer(svc, port=0, max_body_bytes=1024) as server:
            with pytest.raises(RuntimeError, match="HTTP 413"):
                post_npz("127.0.0.1", server.port, request_inputs(0))

    def test_request_timeout_replies_504(self):
        """A request whose result misses request_timeout_s gets a 504
        (and its future is cancelled, freeing the engine slot), not a
        500 — and the server keeps serving."""
        from concurrent.futures import Future
        from pcdms_tpu.serve.http import ServingServer, post_npz

        class StalledService:
            def __init__(self):
                self.futures = []

            def submit(self, timeout=None, **inputs):
                fut = Future()
                self.futures.append(fut)
                return fut              # never resolved by anyone

            def stats(self):
                return {}

            def close(self, drain=True):
                pass

        svc = StalledService()
        with ServingServer(svc, port=0, request_timeout_s=0.2) as server:
            with pytest.raises(RuntimeError, match="HTTP 504"):
                post_npz("127.0.0.1", server.port,
                         {"x": np.zeros((2,), np.float32)})
            assert svc.futures[0].cancelled()
