"""Golden parity: flax U-Net == torch mirror with imported weights
(SURVEY.md §4.2 — torch-CPU as the numeric oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.ckpt.torch_import import flax_params_from_torch
from tpuseg.ckpt.torch_mirror import build_torch_mirror
from tpuseg.core import ModelConfig
from tpuseg.models import build_model

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(features=(8, 16, 32), num_groups=4, head_features=8,
                       compute_dtype="float32")


def test_state_dict_converts_to_full_flax_tree(cfg):
    mirror = build_torch_mirror(cfg)
    params = flax_params_from_torch(mirror.state_dict())
    model = build_model(cfg)
    want = jax.tree.structure(
        model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))["params"]
    )
    got = jax.tree.structure(params)
    assert want == got


def test_forward_parity_with_imported_weights(cfg):
    torch.manual_seed(0)
    mirror = build_torch_mirror(cfg).eval()
    params = flax_params_from_torch(mirror.state_dict())
    model = build_model(cfg)

    x = np.random.default_rng(0).random((2, 16, 16, 16, 1), np.float32)
    with torch.no_grad():
        ref = mirror(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))))
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x))

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
    params = load_pth_checkpoint(path)
    model = build_model(cfg)
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.zeros((1, 8, 8, 8, 1))
    )
    assert np.isfinite(np.asarray(out["fg_logits"])).all()
