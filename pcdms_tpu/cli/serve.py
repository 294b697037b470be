"""Online serving CLI: dynamic-batched pose-transfer inference over HTTP.

Beyond the reference, which only ships offline batch-test scripts
(/root/reference/stage2_batchtest_inpaint_model.py): this starts a
device-resident model behind the dynamic-batching engine
(pcdms_tpu/serve/) and a stdlib HTTP front end. The request contract is
tensors-in / image-out (npz bodies — see serve/http.py): clients send
the preprocessed canvases + DINOv2 features + (full variant) the prior
embedding, exactly the stage-2 pipeline's inputs.

Smoke run (no checkpoints, tiny geometry):
    python -m pcdms_tpu.cli.serve --model stage2 --random_init \
        --tiny_config --height 64 --width 64 --port 8000

Multi-resolution deployment (one pre-warmed engine per canvas behind a
ShapeRouter — XLA serving is static-shape, see serve/router.py):
    python -m pcdms_tpu.cli.serve --model stage2 --random_init \
        --tiny_config --canvas 64 64 --canvas 64 96 --port 8000
Requests are routed by their ``vae_image`` canvas; unknown shapes get
HTTP 400, never a recompile. All engines share one set of parameter
trees (weights are resolution-independent; only the jitted pipelines
are shape-specialized).
"""

from __future__ import annotations

import argparse
import logging

import jax

from pcdms_tpu.cli.common import setup_logging

logger = logging.getLogger("pcdms_tpu.serve.cli")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", choices=["stage2", "cascade"],
                   default="stage2")
    p.add_argument("--weights_name", type=str, default=None,
                   help="stage-2 monolithic checkpoint (.pt)")
    p.add_argument("--stage1_ckpt", type=str, default=None,
                   help="trained prior checkpoint (cascade)")
    p.add_argument("--stage3_ckpt", type=str, default=None,
                   help="trained refine checkpoint (cascade)")
    p.add_argument("--pretrained_model_name_or_path", type=str,
                   default=None, help="SD-2.1 dir (VAE weights)")
    p.add_argument("--img_width", "--width", dest="img_width", type=int,
                   default=512)
    p.add_argument("--img_height", "--height", dest="img_height", type=int,
                   default=512)
    p.add_argument("--canvas", type=int, nargs=2, action="append",
                   metavar=("H", "W"), default=None,
                   help="serve this image size (repeatable): builds one "
                        "pre-warmed engine per canvas behind a "
                        "ShapeRouter; overrides --img_height/--img_width")
    p.add_argument("--num_inference_steps", type=int, default=20)
    p.add_argument("--guidance_scale", type=float, default=2.0)
    p.add_argument("--scheduler", type=str, default="unipc",
                   choices=["unipc", "ddim"])
    p.add_argument("--encoder_cache_interval", type=int, default=1)
    p.add_argument("--simple_variant", action="store_true")
    p.add_argument("--buckets", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each batch over all local devices (pure "
                        "DP serving; buckets must be multiples of the "
                        "device count)")
    p.add_argument("--max_delay_ms", type=float, default=5.0)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--no_warmup", action="store_true",
                   help="skip pre-compiling the batch buckets at startup")
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--tiny_config", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def _service_configs(args, height: int):
    """Model configs + per-size service kwargs (the tiny DINOv2 token
    count depends on the served height; everything else is size-free)."""
    import jax.numpy as jnp

    from pcdms_tpu.models.unet2d import (
        stage2_unet_config, stage3_unet_config,
    )

    vae_cfg = None
    proj_kwargs, pose_kwargs = {}, {}
    dino_kw = {}
    embed_dim = 1024
    if args.tiny_config:
        from pcdms_tpu.cli.common import tiny_configs
        tiny = tiny_configs()
        unet2_cfg = tiny.unet2(with_class_embed=not args.simple_variant)
        unet3_cfg, vae_cfg, prior_cfg = tiny.unet3, tiny.vae, tiny.prior
        proj_kwargs, pose_kwargs = (tiny.image_proj_kwargs,
                                    tiny.pose_proj_kwargs)
        grid = height // tiny.dino.patch_size
        dino_kw = dict(dino_tokens=grid * grid + 1,
                       dino_dim=tiny.dino.hidden_size)
        embed_dim = tiny.prior.embedding_dim
        compute_dtype = jnp.float32
    else:
        unet2_cfg = stage2_unet_config(
            with_class_embed=not args.simple_variant)
        unet3_cfg = stage3_unet_config()
        from pcdms_tpu.models.prior_transformer import PriorConfig
        prior_cfg = PriorConfig()
        compute_dtype = jnp.bfloat16
    return dict(unet2_cfg=unet2_cfg, unet3_cfg=unet3_cfg, vae_cfg=vae_cfg,
                prior_cfg=prior_cfg, proj_kwargs=proj_kwargs,
                pose_kwargs=pose_kwargs, dino_kw=dino_kw,
                embed_dim=embed_dim, compute_dtype=compute_dtype)


def load_service_params(args):
    """Init or load every parameter tree the chosen flavor needs, once.

    Parameters are resolution-independent, so a multi-canvas deployment
    (ShapeRouter) shares one set of trees across all of its
    shape-specialized engines."""
    from pcdms_tpu.models.projections import (
        image_proj_mlp_init, pose_cond_embedding_init,
    )
    from pcdms_tpu.models.unet2d import unet_init
    from pcdms_tpu.models.vae import vae_init

    cfg = _service_configs(args, args.img_height)
    key = jax.random.PRNGKey(args.seed)
    ks = jax.random.split(key, 8)

    if args.random_init:
        vae = (vae_init(ks[3], cfg["vae_cfg"]) if cfg["vae_cfg"]
               else vae_init(ks[3]))
        s2_params = {
            "unet": unet_init(ks[0], cfg["unet2_cfg"]),
            "image_proj": image_proj_mlp_init(ks[1], **cfg["proj_kwargs"]),
            "pose_proj": pose_cond_embedding_init(ks[2],
                                                  **cfg["pose_kwargs"]),
            "vae": vae,
        }
    else:
        from pcdms_tpu.compat.load import (
            load_pcdms_stage2_checkpoint, load_sd_vae,
        )
        if not args.weights_name:
            raise SystemExit("--weights_name required without "
                             "--random_init")
        s2_params = load_pcdms_stage2_checkpoint(args.weights_name)
        s2_params["vae"] = load_sd_vae(args.pretrained_model_name_or_path)
        vae = s2_params["vae"]

    params = {"s2": s2_params}
    if args.model == "cascade":
        from pcdms_tpu.models.prior_transformer import prior_init
        if args.random_init:
            params["s1"] = prior_init(ks[4], cfg["prior_cfg"])
            params["s3"] = {
                "unet": unet_init(ks[5], cfg["unet3_cfg"]),
                "image_proj": image_proj_mlp_init(ks[6],
                                                  **cfg["proj_kwargs"]),
                "vae": vae,
            }
        else:
            from pcdms_tpu.compat.load import (
                load_pcdms_stage3_checkpoint, load_prior,
            )
            if not (args.stage1_ckpt and args.stage3_ckpt):
                raise SystemExit("cascade needs --stage1_ckpt and "
                                 "--stage3_ckpt (or --random_init)")
            params["s1"] = load_prior(args.stage1_ckpt)
            params["s3"] = load_pcdms_stage3_checkpoint(args.stage3_ckpt)
            params["s3"]["vae"] = vae
    return params


def build_service(args, height=None, width=None, params=None):
    """Build one fixed-shape service. ``params`` (from
    :func:`load_service_params`) lets a router deployment share trees;
    omitted, they are loaded here."""
    from pcdms_tpu.serve.stage2 import CascadeService, Stage2Service

    height = args.img_height if height is None else height
    width = args.img_width if width is None else width
    cfg = _service_configs(args, height)
    if params is None:
        params = load_service_params(args)

    mesh = None
    if args.data_parallel:
        from pcdms_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    common = dict(height=height, width=width,
                  guidance_scale=args.guidance_scale,
                  scheduler=args.scheduler,
                  compute_dtype=cfg["compute_dtype"],
                  encoder_cache_interval=args.encoder_cache_interval,
                  embed_dim=cfg["embed_dim"],
                  buckets=tuple(args.buckets),
                  max_delay_ms=args.max_delay_ms,
                  warmup=not args.no_warmup, mesh=mesh, **cfg["dino_kw"])
    if cfg["vae_cfg"] is not None:
        common["vae_cfg"] = cfg["vae_cfg"]

    if args.model == "stage2":
        return Stage2Service(params["s2"], unet_cfg=cfg["unet2_cfg"],
                             num_steps=args.num_inference_steps,
                             simple_variant=args.simple_variant, **common)
    return CascadeService(params["s1"], params["s2"], params["s3"],
                          prior_cfg=cfg["prior_cfg"],
                          stage2_cfg=cfg["unet2_cfg"],
                          stage3_cfg=cfg["unet3_cfg"],
                          steps=args.num_inference_steps, **common)


def build_deployment(args):
    """One service, or N per-canvas services behind a ShapeRouter."""
    if not args.canvas:
        return build_service(args)
    params = load_service_params(args)
    services = [build_service(args, h, w, params=params)
                for h, w in args.canvas]
    if len(services) == 1:
        return services[0]
    from pcdms_tpu.serve.router import ShapeRouter
    return ShapeRouter(services)


def main(argv=None):
    import signal
    import threading

    setup_logging()
    args = parse_args(argv)
    if args.model == "cascade" and args.simple_variant:
        raise SystemExit("--simple_variant is stage2-only")
    from pcdms_tpu.serve.http import ServingServer
    service = build_deployment(args)
    server = ServingServer(service, host=args.host, port=args.port)
    sizes = args.canvas or [[args.img_height, args.img_width]]
    logger.info("model=%s canvases=%s steps=%d buckets=%s delay=%.1fms",
                args.model, ["%dx%d" % (h, w) for h, w in sizes],
                args.num_inference_steps, args.buckets, args.max_delay_ms)

    # graceful shutdown: TPU preemption notices arrive as SIGTERM (same
    # contract as train/loop.py) — stop accepting, drain in-flight work
    done = threading.Event()

    def _on_signal(signum, frame):
        logger.info("signal %d: draining and shutting down", signum)
        done.set()

    for s in (signal.SIGTERM, signal.SIGINT):
        signal.signal(s, _on_signal)

    server.start()
    done.wait()
    server.stop()
    logger.info("served %s", service.stats())


if __name__ == "__main__":
    main()
