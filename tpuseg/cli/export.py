"""``python -m tpuseg.cli.export`` — convert a tpuseg checkpoint (Orbax dir
or ``.pth``) into a torch-mirror ``.pth`` state_dict.

Completes the checkpoint interchange both ways (SURVEY.md C9 / NORTH-STAR
"same checkpoint-in" contract): reference-style tooling can consume weights
trained here, and round-tripping through `ckpt.torch_import` is the identity
(tests/parity/test_torch_mirror.py covers the numeric mapping).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from tpuseg.cli.common import add_config_args, load_config, load_variables

    add_config_args(p)
    p.add_argument("--checkpoint", required=True,
                   help="Orbax checkpoint dir (or .pth to re-export)")
    p.add_argument("--output", required=True, help=".pth file to write")
    args = p.parse_args(argv)
    cfg = load_config(args)

    import torch

    from tpuseg.ckpt.torch_import import torch_state_dict_from_flax
    from tpuseg.models import build_model

    model = build_model(cfg.model)
    variables = load_variables(args.checkpoint, model, cfg)
    sd = torch_state_dict_from_flax(variables)
    torch.save(sd, args.output)
    n_params = sum(int(v.numel()) for v in sd.values())
    print(f"{args.checkpoint} -> {args.output}: {len(sd)} tensors, "
          f"{n_params:,} values")


if __name__ == "__main__":
    main()
