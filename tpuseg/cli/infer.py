"""``python -m tpuseg.cli.infer`` — whole-volume instance segmentation
(mirrors the reference's test.py: checkpoint in, instance-label volume out;
SURVEY.md §3.2, NORTH-STAR I/O contract).
"""

from __future__ import annotations

import argparse
import time


def _exists_with_shape(args, shape) -> bool:
    import os

    import numpy as np

    path = args.output if args.output.endswith(".npy") \
        else args.output + ".partial.npy"
    if not os.path.exists(path):
        return False
    try:
        m = np.load(path, mmap_mode="r")
        return m.shape == tuple(shape) and m.dtype == np.int32
    except Exception:
        return False


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from tpuseg.cli.common import add_config_args, load_config, load_variables

    add_config_args(p)
    p.add_argument("--checkpoint", required=True,
                   help=".pth file (reference format) or Orbax checkpoint dir")
    p.add_argument("--input", required=True, help="volume file (npy/npz/h5/tiff)")
    p.add_argument("--output", required=True,
                   help="instance-label volume out (npy/npz/h5/tiff, int32)")
    p.add_argument("--no-normalize", action="store_true",
                   help="skip percentile normalization (input already in [0,1])")
    p.add_argument("--calibrate-from", default="", metavar="ANNOTATIONS_NPZ",
                   help="weak-annotation npz (centers + half_sizes): derives "
                        "postproc.fg_target_fraction (box->mask inflation "
                        "correction) and a per-axis postproc.nms_radius "
                        "(anisotropic stacks need a smaller z footprint) from "
                        "the instance-shape statistics")
    p.add_argument("--stream", type=int, default=0, metavar="CHUNK_Z",
                   help="stream the volume through the device in z-chunks of "
                        "this depth (for volumes larger than HBM)")
    p.add_argument("--resume-dir", default="",
                   help="with --stream: per-chunk progress checkpoints so a "
                        "killed run resumes from the first incomplete chunk "
                        "(pass the same --output; it holds finished chunks)")
    p.add_argument("--stream-shard", type=int, default=0, metavar="N",
                   help="with --stream: shard each z-chunk over y across N "
                        "devices (streamed x sharded composition)")
    p.add_argument("--report-convergence", action="store_true",
                   help="report the watershed flood-truncation count "
                        "(nonzero means PostprocConfig.flood_iters cut the "
                        "fixed point short; computed in-program, works on "
                        "every backend); nonzero exits with status 4")
    p.add_argument("--validate", action="store_true",
                   help="check the output invariant that every instance is "
                        "one 6-connected component (ops.label_components)")
    p.add_argument("--shard", default="", metavar="MESH",
                   help='GSPMD-shard the volume over the available devices: '
                        '"z8" (1-D z slabs) or "z2,y4" (2-D z,y blocks); the '
                        'axis sizes must multiply to the device count')
    args = p.parse_args(argv)
    cfg = load_config(args)

    from tpuseg.cli.common import bootstrap_runtime

    bootstrap_runtime()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuseg.data.volume_io import load_volume, save_volume
    from tpuseg.infer import make_infer_fn
    from tpuseg.models import build_model

    model = build_model(cfg.model)
    variables = jax.tree.map(jnp.asarray, load_variables(args.checkpoint, model, cfg))
    volume = load_volume(args.input).astype(np.float32)

    if args.calibrate_from:
        import dataclasses

        from tpuseg.data.volume_io import load_annotations
        from tpuseg.ops.calibrate import (adaptive_upper_pct,
                                          expected_fg_fraction,
                                          nms_radius_from_half_sizes)

        _, half_sizes = load_annotations(args.calibrate_from)
        frac = expected_fg_fraction(half_sizes, volume.size)
        nms_r = nms_radius_from_half_sizes(half_sizes)
        upper = adaptive_upper_pct(frac, default_upper=cfg.data.normalize_pcts[1])
        cfg = dataclasses.replace(
            cfg,
            postproc=dataclasses.replace(
                cfg.postproc, fg_target_fraction=frac, nms_radius=nms_r),
            data=dataclasses.replace(
                cfg.data, normalize_pcts=(cfg.data.normalize_pcts[0], upper)))
        print(f"calibrated from {args.calibrate_from}: "
              f"fg_target_fraction={frac:.5f} nms_radius={nms_r} "
              f"normalize_upper_pct={upper:.4f}")

    t0 = time.perf_counter()
    if args.stream:
        from tpuseg.infer import stream_infer

        mesh = None
        if args.stream_shard:
            from jax.sharding import Mesh

            n = args.stream_shard
            if n > len(jax.devices()):
                raise SystemExit(f"--stream-shard {n} needs {n} devices, "
                                 f"have {len(jax.devices())}")
            mesh = Mesh(np.asarray(jax.devices()[:n]), ("y",))
        out = None
        if args.resume_dir:
            # persistent int32 memmap at the OUTPUT path so completed chunks
            # survive a kill (save_volume below replaces it atomically for
            # non-npy formats)
            out = np.lib.format.open_memmap(
                args.output if args.output.endswith(".npy")
                else args.output + ".partial.npy",
                mode="r+" if _exists_with_shape(args, volume.shape)
                else "w+", dtype=np.int32, shape=volume.shape)
        stream_stats = {}
        labels = stream_infer(model, cfg, variables, volume,
                              chunk_z=args.stream, out=out,
                              normalize=not args.no_normalize,
                              mesh=mesh,
                              resume_dir=args.resume_dir or None,
                              stats=stream_stats)
        n_trunc = stream_stats.get("flood_truncated_voxels", 0)
    elif args.shard:
        import re

        from jax.sharding import Mesh

        from tpuseg.infer import make_sharded_infer_fn, shard_volume

        spec = [(m.group(1), int(m.group(2)))
                for m in re.finditer(r"([zy])(\d+)", args.shard)]
        if not spec or [a for a, _ in spec] not in (["z"], ["z", "y"]):
            raise SystemExit(f'bad --shard spec {args.shard!r}: use "z8" or "z2,y4"')
        shape = tuple(n for _, n in spec)
        total = int(np.prod(shape))
        if total > len(jax.devices()):
            raise SystemExit(f"--shard {args.shard} needs {total} devices, "
                             f"have {len(jax.devices())}")
        mesh = Mesh(np.asarray(jax.devices()[:total]).reshape(shape),
                    tuple(a for a, _ in spec))
        infer = make_sharded_infer_fn(model, cfg, mesh,
                                      normalize=not args.no_normalize)
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())
        variables = jax.tree.map(lambda a: jax.device_put(a, rep), variables)
        labels = np.asarray(infer(
            variables, shard_volume(jnp.asarray(volume), mesh)))
    else:
        # bind the checkpoint into the program: weight-side repacks fold at
        # compile time, and the flagship single-tile/auto program only
        # compiles bound (see infer/pipeline.py make_infer_fn)
        infer = make_infer_fn(model, cfg, normalize=not args.no_normalize,
                              bind_variables=variables,
                              with_diagnostics=args.report_convergence)
        if args.report_convergence:
            labels, diag = infer(jnp.asarray(volume))
            labels = np.asarray(labels)
            n_trunc = int(diag["flood_truncated"])
        else:
            labels = np.asarray(infer(jnp.asarray(volume)))
    dt = time.perf_counter() - t0

    trunc_exit = False
    if args.report_convergence:
        if args.shard:
            print("--report-convergence: not wired for --shard "
                  "(use --stream or single-device)")
        else:
            status = "CONVERGED" if n_trunc == 0 else "TRUNCATED"
            print(f"flood convergence: {status} "
                  f"({n_trunc} truncated voxels — raise "
                  "postproc.flood_iters)" if n_trunc else
                  f"flood convergence: {status} (0 truncated voxels)")
            trunc_exit = n_trunc > 0

    if args.validate:
        from tpuseg.ops.components import labels_are_connected

        ok = labels_are_connected(labels)
        print(f"connectivity validation: {'OK' if ok else 'FAILED'}")
        if not ok:
            raise SystemExit(3)

    if args.stream and args.resume_dir and args.output.endswith(".npy"):
        labels.flush()  # the output memmap IS the result file
    else:
        save_volume(args.output, labels)
        if args.stream and args.resume_dir:
            import os

            os.remove(args.output + ".partial.npy")
    n = int(labels.max())
    mvox = volume.size / 1e6
    print(f"{args.input}: {volume.shape} -> {n} instances "
          f"in {dt:.2f}s ({mvox / dt:.2f} Mvox/s incl. compile) -> {args.output}")
    if trunc_exit:
        # labels are saved above (still useful); the nonzero status makes
        # truncation visible to pipelines/scripts
        raise SystemExit(4)


if __name__ == "__main__":
    main()
