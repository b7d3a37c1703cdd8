"""North-star benchmark (BASELINE.json): prints ONE JSON line

  {"metric": ..., "value": N, "unit": "Mvox/s", "vs_baseline": N, "detail": {...}}

The headline metric stays r01-comparable: end-to-end fused inference
Mvoxels/sec/chip (net + post-proc) on a full microscopy-stack-sized volume
with randomly-initialized weights, bf16, everything on device (config 3's
program). ``vs_baseline`` = headline / measured untrained CPU-reference
Mvox/s (torch-CPU sliding window + scipy post-proc; cached in
BASELINE_CPU.json; NORTH-STAR target >= 5).

``detail`` carries the rest of the BASELINE.json matrix (VERDICT r1 item 5),
all measured here:
  split        — per-stage seconds (normalize / net sweep / post-proc) and
                 the net sweep's bf16 MFU on this chip
  c1_patch64_fp32       — single 64-cubed patch, fp32, e2e (config 1)
  c2_stack_fp32_tiled   — full stack, fp32 tiled e2e (config 2)
  c3_trained_bf16_fused — the REAL use case: a trained checkpoint (200
                 deterministic steps, cached in .bench/) on the same stack,
                 with volume-matched calibration; reports instance F1 vs the
                 synthetic GT and Mvox/s vs the SAME-weights CPU reference
                 (BASELINE_CPU_TRAINED.json). The untrained headline is
                 post-proc-adversarial (~95% foreground noise); this row is
                 the representative production number. (config 3)
  c4_train_bf16 — training-step throughput, single chip (config 4 single-
                 chip leg; the v4-8 figure extrapolates via the DP tests)
The CPU denominators are measured at two sizes to bound the per-voxel
extrapolation error instead of assuming flat cost (VERDICT r1 weak 6).

TPUSEG_BENCH_FAST=1 skips everything but the headline.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CPU_BASELINE_PATH = os.path.join(REPO, "BASELINE_CPU.json")
CPU_TRAINED_PATH = os.path.join(REPO, "BASELINE_CPU_TRAINED.json")
WEIGHTS_CACHE = os.path.join(REPO, ".bench", "weights_r4_aniso.msgpack")
VOLUME_SHAPE = (96, 512, 512)  # NORTH-STAR config 2/3 stack size
PEAK_BF16_FLOPS = 197e12       # TPU v5e


def _sync(x):
    import numpy as np

    # on the axon platform block_until_ready can return before execution
    # finishes; a 1-element device_get is the only reliable sync
    np.asarray(x.ravel()[0])
    return x


def _median_time(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def get_cpu_baseline(path, variables=None, tag="untrained") -> dict:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    from benchmarks.cpu_reference import run_cpu_reference
    from tpuseg.data import synthesize_volume

    # measure at two sizes to BOUND the per-voxel extrapolation to the full
    # 25-MVoxel stack (a full-size run would take ~an hour on this 1-core
    # host); the small/large spread is recorded as the error bound
    small = synthesize_volume(shape=(16, 128, 128), num_instances=8, seed=0)
    large = synthesize_volume(shape=(32, 256, 256), num_instances=40, seed=0)
    r_small = run_cpu_reference(small.image, variables=variables)
    r_large = run_cpu_reference(large.image, variables=variables)
    res = {
        "tag": tag,
        "mvox_per_s": r_large["mvox_per_s"],
        "mvox_per_s_16x128x128": r_small["mvox_per_s"],
        "extrapolation_spread": round(
            abs(r_large["mvox_per_s"] - r_small["mvox_per_s"])
            / r_large["mvox_per_s"], 3),
        "t_net_s": r_large["t_net_s"],
        "t_post_s": r_large["t_post_s"],
        "n_instances": r_large["n_instances"],
    }
    with open(path, "w") as f:
        json.dump(res, f, indent=2)
    return res


def make_cfg(compute_dtype="bfloat16", tile=(96, 512, 512), halo=(0, 0, 0),
             tile_batch=1, conv_impl="auto", program="staged", **post):
    from tpuseg.core import Config, InferConfig, ModelConfig, PostprocConfig

    # Flagship pin (late r3, ARCHITECTURE.md "layout waterbed" + "single-tile
    # flagship"). The whole volume as ONE tile with NO halo — voxel-exact by
    # construction (no seams) — beats every tiled config:
    # * net sweep (96,512,512)x1: auto 405 ms / zdecomp 489 vs the r3-era
    #   2-tile (96,256,512)+(0,8,0) zdecomp at 523 ms. The waterbed moves
    #   with shape: at the old tile all schedules sat within ~3%; at the
    #   full volume "auto" (s2patch downs + parity ups + zdecomp 3x3x3)
    #   wins by 17%.
    # * the single tile only FITS as program="staged" (net | post as two
    #   chained programs, device-resident handoff): the joint program's
    #   buffer assignment exceeds HBM by ~0.8 GB.
    # * weights must be BOUND (make_infer_fn(bind_variables=...)): the auto
    #   sweep with weights as runtime parameters crashes the XLA-TPU AOT
    #   compiler at this shape (zdecomp compiles either way); bound, the
    #   weight-side repacks fold at compile time. e2e 637 ms = 39.5 Mvox/s
    #   vs 767 ms = 32.8 for the r3-era tiled config (same program content,
    #   74.5k instances either way).
    # * historical tiled-config numbers (kept for c6, which still measures
    #   them): halo 8 vs 16 F1-identical, (0,8,0) per-axis at 29.5 Mvox/s,
    #   edge-pad-exact anchor (96,512,256)+(0,0,56) at 24.2 Mvox/s.
    return Config(
        model=ModelConfig(conv_impl=conv_impl),
        infer=InferConfig(tile=tile, halo=halo, tile_batch=tile_batch,
                          compute_dtype=compute_dtype, program=program),
        postproc=PostprocConfig(**post),
    )


def get_trained_variables(cfg):
    """Deterministic 200-step training of the flagship model; cached."""
    import jax
    from flax import serialization

    from tpuseg.data import synthesize_volume
    from tpuseg.models import build_model, init_variables

    model = build_model(cfg.model)
    template = init_variables(model, jax.random.key(0),
                              patch_shape=cfg.data.patch_size)
    if os.path.exists(WEIGHTS_CACHE):
        with open(WEIGHTS_CACHE, "rb") as f:
            return serialization.from_bytes(template, f.read()), None

    import dataclasses

    from tpuseg.train import train

    # train with the native conv schedule: zpack wins the INFERENCE tile
    # sweep but is ~2x slower on 64^3 training batches (fwd+bwd); parameters
    # are schedule-independent so the cached weights serve both
    # anisotropy-robust recipe (r4, benchmarks/aniso_train_ab.py — recorded
    # in benchmarks/results_aniso_ab_r4.json): z-scale augmentation + per-
    # instance aniso peak sigma take the c5 aniso stress leg F1@IoU0.5
    # 0.685 -> 0.882 while IMPROVING the isotropic control (0.965 -> 0.988)
    tr = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, conv_impl="native"),
        data=dataclasses.replace(cfg.data, aug_zscale=(0.5, 1.0),
                                 peak_sigma_aniso=True),
        train=dataclasses.replace(cfg.train, total_steps=200, warmup_steps=20,
                                  lr=1e-3, log_every=40, ckpt_every=100_000),
    )
    vols = [synthesize_volume(shape=(64, 192, 192), num_instances=60, seed=s)
            for s in (42, 43)]
    t0 = time.perf_counter()
    state, history = train(tr, vols)
    train_s = time.perf_counter() - t0
    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    os.makedirs(os.path.dirname(WEIGHTS_CACHE), exist_ok=True)
    with open(WEIGHTS_CACHE, "wb") as f:
        f.write(serialization.to_bytes(variables))
    return variables, {"train_s": round(train_s, 1),
                       "final_loss": round(history[-1]["loss"], 4)}


def main():
    from tpuseg.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.flops import unet_flops_per_voxel
    from tpuseg.data import synthesize_volume
    from tpuseg.data.normalize import histogram_percentile_normalize
    from tpuseg.infer import make_infer_fn
    from tpuseg.infer.pipeline import _postprocess
    from tpuseg.infer.tiles import tiled_forward
    from tpuseg.models import build_model, init_variables

    fast = os.environ.get("TPUSEG_BENCH_FAST", "") == "1"

    cfg = make_cfg()
    model = build_model(cfg.model)
    variables0 = init_variables(model, jax.random.key(0),
                                patch_shape=cfg.data.patch_size)
    # the CPU denominator runs the SAME (jax-seeded) weights through the
    # torch mirror, so both sides see the same maps and the same post-proc
    # load — an unseeded torch init made the denominator irreproducible
    # (one draw produced 0 instances and a trivially fast scipy stage)
    cpu = get_cpu_baseline(CPU_BASELINE_PATH, variables=variables0)
    vol = synthesize_volume(shape=VOLUME_SHAPE, num_instances=600,
                            radius_range=(5.0, 10.0), seed=0)
    v = jnp.asarray(vol.image)
    detail = {
        "volume": list(VOLUME_SHAPE),
        "device": str(jax.devices()[0]),
        "compute_dtype": cfg.infer.compute_dtype,
        "cpu_ref_mvox_per_s": round(cpu["mvox_per_s"], 4),
        "cpu_ref_extrapolation_spread": cpu.get("extrapolation_spread"),
    }

    # ---- headline: untrained bf16 fused stack (r01-comparable) ----
    # bound weights + staged program: see make_cfg comment — same computation
    # as r1/r2's one-program call, still zero host round-trips
    infer = make_infer_fn(model, cfg, bind_variables=variables0)
    labels = _sync(infer(v))  # compile + warmup
    trace_dir = os.environ.get("TPUSEG_TRACE")
    if trace_dir:  # Perfetto trace of one headline run (utils/profiling.py)
        from tpuseg.utils.profiling import trace

        with trace(trace_dir):
            _sync(infer(v))
    t_e2e = _median_time(lambda: _sync(infer(v)))
    mvox_s = v.size / t_e2e / 1e6
    detail["t_e2e_s"] = round(t_e2e, 4)
    detail["n_instances"] = int(np.asarray(labels).max())

    if not fast:
        # ---- per-stage split + MFU (the headline program, staged) ----
        from tpuseg.core.dtypes import resolve

        norm_fn = jax.jit(lambda x: histogram_percentile_normalize(
            x.astype(jnp.float32), cfg.data.normalize_pcts,
            sample_stride=cfg.data.normalize_sample_stride))
        nv = _sync(norm_fn(v))
        t_norm = _median_time(lambda: _sync(norm_fn(v)))

        def net_fn(nv):
            # variables0 closed over = bound, matching the headline program
            return tiled_forward(lambda q, b: model.apply(q, b), variables0,
                                 nv,
                                 tile=cfg.infer.tile, halo=cfg.infer.halo,
                                 tile_batch=cfg.infer.tile_batch,
                                 compute_dtype=resolve(cfg.infer.compute_dtype))
        net_jit = jax.jit(net_fn)
        out = net_jit(nv)
        _sync(out["fg_logits"])
        t_net = _median_time(lambda: _sync(net_jit(nv)["fg_logits"]))

        post_jit = jax.jit(lambda fg, pk: _postprocess(
            jax.nn.sigmoid(fg), jax.nn.sigmoid(pk), cfg))
        fgl, pkl = out["fg_logits"], out["peak_logits"]
        _sync(post_jit(fgl, pkl))
        t_post = _median_time(lambda: _sync(post_jit(fgl, pkl)))

        from tpuseg.infer.tiles import halo3

        td, th, tw = cfg.infer.tile
        hd, hh, hw = halo3(cfg.infer.halo)
        overcompute = (((td + 2 * hd) * (th + 2 * hh) * (tw + 2 * hw))
                       / (td * th * tw))
        flops = v.size * overcompute * unet_flops_per_voxel(cfg.model)
        detail["split"] = {
            "t_norm_s": round(t_norm, 4),
            "t_net_s": round(t_net, 4),
            "t_post_s": round(t_post, 4),
            "net_mfu_bf16": round(flops / t_net / PEAK_BF16_FLOPS, 4),
            "net_overcompute": round(overcompute, 3),
        }

        # ---- config 1: single 64^3 patch, fp32, e2e ----
        c1 = make_cfg("float32", tile=(64, 64, 64), min_size=8)
        p = jnp.asarray(vol.image[:64, :64, :64])
        inf1 = make_infer_fn(build_model(c1.model), c1,
                             bind_variables=variables0)
        _sync(inf1(p))
        t1 = _median_time(lambda: _sync(inf1(p)), reps=5)
        # VERDICT r3 weak #7: on this axon-tunneled host a host-visible
        # dispatch costs ~30 ms of fixed sync — ~60% of the 64^3 e2e time.
        # Measure it (empty jitted program, same sync discipline) and quote
        # the overhead-corrected number alongside, so the tiny-patch row
        # isn't read as the chip's per-voxel speed.
        noop = jax.jit(lambda x: x + 1)
        _sync(noop(jnp.zeros((8,), jnp.float32)))
        t_disp = _median_time(lambda: _sync(noop(jnp.zeros((8,), jnp.float32))),
                              reps=5)
        detail["c1_patch64_fp32"] = {
            "t_e2e_s": round(t1, 4), "mvox_s": round(p.size / t1 / 1e6, 3),
            "t_dispatch_overhead_s": round(t_disp, 4),
            "mvox_s_excl_dispatch": round(p.size / max(t1 - t_disp, 1e-9) / 1e6, 3),
        }

        # ---- config 2: full stack, fp32 tiled ----
        c2 = make_cfg("float32")
        inf2 = make_infer_fn(build_model(c2.model), c2,
                             bind_variables=variables0)
        _sync(inf2(v))
        t2 = _median_time(lambda: _sync(inf2(v)))
        detail["c2_stack_fp32_tiled"] = {
            "t_e2e_s": round(t2, 4), "mvox_s": round(v.size / t2 / 1e6, 3)}

        # ---- config 3 (representative): trained ckpt + calibration ----
        from tpuseg.eval import instance_metrics
        from tpuseg.ops.calibrate import expected_fg_fraction

        trained, train_info = get_trained_variables(cfg)
        frac = expected_fg_fraction(vol.half_sizes, vol.image.size)
        # Trained path runs the fused Mosaic ConvBlocks (r4, flat chaining —
        # ARCHITECTURE.md): beats the flax forward by ~10% e2e with F1 1.0
        # and 99.6% voxel agreement. Tile (96,256,512): the flat
        # intermediates of the single-tile (96,512,512) fused program exceed
        # HBM. The HEADLINE stays on flax/single-tile: untrained noise
        # logits sit on the sigmoid(0)=0.5 threshold knife-edge, where any
        # alternate-but-equally-valid rounding chaotically flips instance
        # counts — the r1-comparable number must keep one fixed math path.
        c3 = dataclasses.replace(
            cfg,
            infer=dataclasses.replace(cfg.infer, tile=(96, 256, 512),
                                      halo=(0, 8, 0), apply_impl="fused"),
            postproc=dataclasses.replace(
                cfg.postproc, fg_target_fraction=frac, peak_threshold=0.35))
        inf3 = make_infer_fn(model, c3, bind_variables=trained)
        lab3 = _sync(inf3(v))
        t3 = _median_time(lambda: _sync(inf3(v)))
        m = instance_metrics(np.asarray(lab3), vol.labels, iou_threshold=0.5)
        cpu_tr = get_cpu_baseline(CPU_TRAINED_PATH, variables=trained,
                                  tag="trained")
        detail["c3_trained_bf16_fused"] = {
            "t_e2e_s": round(t3, 4),
            "apply_impl": "fused",
            "mvox_s": round(v.size / t3 / 1e6, 3),
            "n_instances": int(np.asarray(lab3).max()),
            "f1_iou50_vs_gt": round(m["f1"], 4),
            "cpu_trained_mvox_per_s": round(cpu_tr["mvox_per_s"], 4),
            "vs_cpu_trained": round(v.size / t3 / 1e6 / cpu_tr["mvox_per_s"], 1),
            **(train_info or {}),
        }

        # ---- c5: adversarial quality matrix (VERDICT r2 #3) ----
        # Touching/overlapping pairs + SNR sweep + illumination gradient,
        # scored with the SAME trained checkpoint and compiled program as c3
        # (fixtures generated at the headline stack shape). The "F1 within
        # 0.5 pts" claim must hold where nuclei actually touch.
        from tpuseg.data import synthesize_touching_volume

        adversarial = {
            "touch60_snr20": dict(touch_factor=0.6, noise=0.05),
            "touch60_snr8": dict(touch_factor=0.6, noise=0.12),
            "touch50_overlap": dict(touch_factor=0.5, noise=0.05),
            "touch70_gradient": dict(touch_factor=0.7, noise=0.05,
                                     gradient=0.3),
            # anisotropic-PSF stress (VERDICT r2 missing #3): z compressed
            # to 0.35x of the 0.6x the checkpoint was trained on — flat
            # ellipsoids whose z-saddles are ~2 voxels wide
            "touch65_aniso035": dict(touch_factor=0.65, noise=0.05,
                                     anisotropy=(0.35, 1.0, 1.0)),
        }
        from tpuseg.ops.calibrate import nms_radius_from_half_sizes

        c5 = {}
        for name, kw in adversarial.items():
            tv = synthesize_touching_volume(
                shape=VOLUME_SHAPE, num_pairs=150, num_singles=100,
                radius_range=(5.0, 8.0), seed=17, **kw)
            frac_a = expected_fg_fraction(tv.half_sizes, tv.image.size)
            # per-axis NMS footprint from the same annotations (z-compressed
            # instances put touching z-pairs' peaks inside an isotropic
            # radius-2 window — whole instances vanish)
            nms_r = nms_radius_from_half_sizes(tv.half_sizes)
            c5cfg = dataclasses.replace(c3, postproc=dataclasses.replace(
                c3.postproc, fg_target_fraction=frac_a, nms_radius=nms_r))
            inf5 = make_infer_fn(model, c5cfg, bind_variables=trained)
            lab5 = np.asarray(_sync(inf5(jnp.asarray(tv.image))))
            mi = instance_metrics(lab5, tv.labels, iou_threshold=0.5)
            mc = instance_metrics(lab5, tv.labels, criterion="center")
            c5[name] = {
                "n_gt": int(tv.labels.max()),
                "n_pred": mi["n_pred"],
                "nms_radius": list(nms_r),
                "f1_iou50": round(mi["f1"], 4),
                "f1_center": round(mc["f1"], 4),
                "mean_iou": round(mi["mean_matched_iou"], 4)
                if mi["mean_matched_iou"] == mi["mean_matched_iou"] else None,
            }
            if kw.get("anisotropy") is not None:
                # A/B the derivation's value on the aniso stress leg
                iso_cfg = dataclasses.replace(c5cfg, postproc=dataclasses.replace(
                    c5cfg.postproc, nms_radius=2))
                lab_i = np.asarray(_sync(make_infer_fn(
                    model, iso_cfg, bind_variables=trained)(jnp.asarray(tv.image))))
                mci = instance_metrics(lab_i, tv.labels, criterion="center")
                c5[name]["f1_center_iso_radius2"] = round(mci["f1"], 4)
                c5[name]["recall_center_iso_radius2"] = round(mci["recall"], 4)
                c5[name]["recall_center"] = round(mc["recall"], 4)
        detail["c5_adversarial_quality"] = c5

        # ---- c6: halo-exactness quantification (VERDICT r2 weak #2) ----
        # The FLAGSHIP is now voxel-exact by construction (whole volume as
        # one tile, no seams). This leg quantifies the TILED configs —
        # required whenever a volume exceeds single-tile memory — against
        # two exact references: the flagship (zero-SAME border convention)
        # and the edge-pad-exact anchor (tile (96,512,256) + halo (0,0,56):
        # halo >= RF on its only split axis = the edge-padded whole-volume
        # forward). Both the standard and an adversarial touching fixture.
        tv = synthesize_touching_volume(
            shape=VOLUME_SHAPE, num_pairs=150, num_singles=100,
            radius_range=(5.0, 8.0), touch_factor=0.6, noise=0.05, seed=17)
        variants = {
            "flagship": (cfg.infer.tile, cfg.infer.halo),  # single-tile exact
            "halo8": ((96, 256, 512), (0, 8, 0)),   # r3-era tiled flagship
            "halo16": ((96, 256, 512), (0, 16, 0)),
            "exact": ((96, 512, 256), (0, 0, 56)),  # edge-pad-exact anchor
        }
        c6 = {}
        for fixture_name, fv, gt in (("standard", vol.image, vol.labels),
                                     ("touching", tv.image, tv.labels)):
            frac_h = expected_fg_fraction(
                vol.half_sizes if fixture_name == "standard" else tv.half_sizes,
                fv.size)
            row = {}
            labs = {}
            for vname, (vtile, vhalo) in variants.items():
                ch = dataclasses.replace(
                    c3,
                    # c6 measures HALO configs on the flax apply: the fused
                    # kernel's flat intermediates exceed HBM at the
                    # single-tile variants, and the leg's r2/r3 numbers are
                    # flax-path baselines
                    infer=dataclasses.replace(c3.infer, tile=vtile,
                                              halo=vhalo, apply_impl="flax"),
                    postproc=dataclasses.replace(
                        c3.postproc, fg_target_fraction=frac_h))
                infh = make_infer_fn(model, ch, bind_variables=trained)
                fv_dev = jnp.asarray(fv)   # upload once: time the program,
                labs[vname] = np.asarray(_sync(infh(fv_dev)))
                th_ = _median_time(          # not the host tunnel
                    lambda: _sync(infh(fv_dev)))
                mh = instance_metrics(labs[vname], gt, iou_threshold=0.5)
                row[f"f1_iou50_{vname}"] = round(mh["f1"], 4)
                row[f"t_e2e_s_{vname}"] = round(th_, 4)
            for vname in ("flagship", "halo8", "halo16"):
                row[f"voxel_agreement_{vname}_vs_exact"] = round(
                    float((labs[vname] == labs["exact"]).mean()), 6)
            c6[fixture_name] = row
        detail["c6_halo_exactness"] = c6

        # ---- config 4: training-step throughput, single chip ----
        from tpuseg.data import PatchSampler
        from tpuseg.models import build_model as _bm
        from tpuseg.train.step import create_train_state, make_train_step

        # native conv schedule for training (see get_trained_variables note)
        tcfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, conv_impl="native"))
        tmodel = _bm(tcfg.model)
        state = create_train_state(tmodel, tcfg, jax.random.key(0))
        step_fn = jax.jit(make_train_step(tmodel, tcfg), donate_argnums=(0,))
        # uint16 source, the realistic microscopy feed: the sampler preserves
        # the source dtype so the H2D upload is half the f32 one (the device
        # casts inside prepare_batch; training math identical up to the
        # source quantization)
        vol16 = dataclasses.replace(
            vol, image=(np.clip(vol.image, 0, 1) * 65535).astype(np.uint16))
        sampler = PatchSampler([vol16], patch_size=cfg.data.patch_size,
                               batch_size=cfg.data.batch_size,
                               max_instances=cfg.data.max_instances)
        rng = jax.random.key(1)
        batch = jax.device_put(sampler.next_batch())
        state, metrics = step_fn(state, batch, rng)   # compile
        _sync(metrics["loss"])
        # pure on-device step: loop over ONE resident batch — no host feed
        # in the timing (augmentation keys still vary per step via rng reuse;
        # the program is identical to the fed run's)
        n_pure, t0 = 10, time.perf_counter()
        for _ in range(n_pure):
            state, metrics = step_fn(state, batch, rng)
        _sync(metrics["loss"])
        dt_pure = (time.perf_counter() - t0) / n_pure
        # fed step, through the prefetcher exactly like train.loop: sampling
        # AND the async H2D upload ride the worker thread under device
        # compute. NOTE this environment's host<->device tunnel runs at
        # ~27 MB/s, so the ~34 MB/batch upload dominates and fluctuates with
        # host load — on real TPU hosts (PCIe) the fed step tracks the pure
        # step; both are reported so the bound is visible.
        from tpuseg.data.prefetch import BatchPrefetcher
        with BatchPrefetcher(sampler, put=jax.device_put, depth=2) as feed:
            n_steps, t0 = 20, time.perf_counter()
            for _ in range(n_steps):
                state, metrics = step_fn(state, feed.next(), rng)
            _sync(metrics["loss"])
            dt = (time.perf_counter() - t0) / n_steps
        vox = cfg.data.batch_size * int(np.prod(cfg.data.patch_size))
        batch_mb = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                       for a in jax.tree_util.tree_leaves(batch)) / 1e6
        # train MFU (VERDICT r2 #7): fwd + bwd ~= 3x forward FLOPs
        train_flops = 3 * vox * unet_flops_per_voxel(tcfg.model)
        detail["c4_train_bf16"] = {
            "step_ms": round(dt * 1e3, 2),
            "step_ms_pure": round(dt_pure * 1e3, 2),
            "batch_mb": round(batch_mb, 1),
            "mvox_s": round(vox / dt / 1e6, 3),
            "mvox_s_pure": round(vox / dt_pure / 1e6, 3),
            "train_mfu_bf16": round(train_flops / dt_pure / PEAK_BF16_FLOPS, 4),
        }

    result = {
        "metric": "e2e_fused_infer_mvox_per_s_per_chip",
        "value": round(mvox_s, 3),
        "unit": "Mvox/s",
        "vs_baseline": round(mvox_s / cpu["mvox_per_s"], 3),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
