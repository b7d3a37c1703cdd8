"""Golden parity: flax U-Net == torch mirror with imported weights
(SURVEY.md §4.2 — torch-CPU as the numeric oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.ckpt.torch_import import flax_variables_from_torch
from tpuseg.ckpt.torch_mirror import build_torch_mirror
from tpuseg.core import ModelConfig
from tpuseg.models import build_model, init_variables

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(features=(8, 16, 32), num_groups=4, head_features=8,
                       compute_dtype="float32")


def _randomize_bn_stats(mirror, seed=0):
    """Mirror inits running stats to (0, 1) — randomize so parity actually
    exercises the stats import path."""
    g = torch.Generator().manual_seed(seed)
    for m in mirror.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.2)
            m.running_var.copy_(1.0 + 0.3 * torch.rand(m.running_var.shape, generator=g))


def test_state_dict_converts_to_full_flax_tree(cfg):
    mirror = build_torch_mirror(cfg)
    variables = flax_variables_from_torch(mirror.state_dict())
    model = build_model(cfg)
    want = init_variables(model, jax.random.key(0), patch_shape=(8, 8, 8))
    assert jax.tree.structure(want["params"]) == jax.tree.structure(variables["params"])
    assert jax.tree.structure(want["batch_stats"]) == jax.tree.structure(
        variables["batch_stats"]
    )


def test_forward_parity_with_imported_weights(cfg):
    torch.manual_seed(0)
    mirror = build_torch_mirror(cfg).eval()
    with torch.no_grad():
        _randomize_bn_stats(mirror)
    variables = flax_variables_from_torch(mirror.state_dict())
    model = build_model(cfg)

    x = np.random.default_rng(0).random((2, 16, 16, 16, 1), np.float32)
    with torch.no_grad():
        ref = mirror(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))))
    out = model.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x))

    for key in ("fg_logits", "peak_logits"):
        a = np.asarray(out[key])
        b = ref[key].numpy()
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_pth_roundtrip(tmp_path, cfg):
    from tpuseg.ckpt import load_pth_checkpoint

    mirror = build_torch_mirror(cfg)
    path = str(tmp_path / "ref.pth")
    torch.save(mirror.state_dict(), path)
    variables = load_pth_checkpoint(path)
    model = build_model(cfg)
    out = model.apply(
        jax.tree.map(jnp.asarray, variables), jnp.zeros((1, 8, 8, 8, 1))
    )
    assert np.isfinite(np.asarray(out["fg_logits"])).all()
