"""Full-state checkpoint round-trip (orbax) + introspection + in-graph DCI op."""

import jax
import jax.numpy as jnp
import numpy as np

from inclusivegan_tpu.models import Discriminator, GMain
from inclusivegan_tpu.training.checkpoint import (latest_checkpoint,
                                                  load_checkpoint,
                                                  save_checkpoint)
from inclusivegan_tpu.training.train_state import create_train_state


def _models():
    G = GMain.create(resolution=16, num_channels=3, latent_size=16,
                     dlatent_size=16, fmap_base=128, fmap_max=16,
                     mapping_layers=1, mapping_fmaps=16)
    D = Discriminator(resolution=16, num_channels=3, fmap_base=128,
                      fmap_max=16, mbstd_group_size=2)
    return G, D


def test_checkpoint_roundtrip(tmp_path):
    G, D = _models()
    state = create_train_state(jax.random.key(0), G, D)
    state = state._replace(step=jnp.asarray(42, jnp.int32),
                           pl_mean=jnp.asarray(1.5, jnp.float32))
    imle = {"cursor": 128, "staleness": 20}
    path = save_checkpoint(str(tmp_path / "ckpt"), state, imle)
    assert latest_checkpoint(str(tmp_path / "ckpt")) == path

    target = create_train_state(jax.random.key(1), G, D)  # different init
    restored, imle2 = load_checkpoint(path, target)
    assert int(restored.step) == 42
    assert float(restored.pl_mean) == 1.5
    assert imle2["cursor"] == 128 and imle2["staleness"] == 20
    w0 = state.g_params["synthesis"]["4x4"]["Conv"]["weight"]
    w1 = restored.g_params["synthesis"]["4x4"]["Conv"]["weight"]
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
    m0 = state.g_opt.m["synthesis"]["4x4"]["Conv"]["weight"]
    m1 = restored.g_opt.m["synthesis"]["4x4"]["Conv"]["weight"]
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))


def test_print_layers_counts():
    from inclusivegan_tpu.utils.network_util import count_params, list_layers
    G, D = _models()
    params = G.init(jax.random.key(0))
    rows = list_layers(params["synthesis"])
    assert any("4x4/Conv" in name for name, _n, _s in rows)
    assert sum(n for _name, n, _s in rows) == count_params(params["synthesis"])


def test_dci_nn_search_op_inside_jit():
    from inclusivegan_tpu.dci.jax_op import DciNnSearch
    r = np.random.RandomState(0)
    data = r.randn(500, 8)
    op = DciNnSearch(dim=8, num_levels=1)
    op.update_db(data)

    @jax.jit
    def lookup(q):
        ids, dists = op.nn_search(q, num_neighbours=1, max_retrieve=500)
        return ids[:, 0], dists[:, 0]

    q = jnp.asarray(data[:5] + 1e-6)
    ids, dists = lookup(q)
    np.testing.assert_array_equal(np.asarray(ids), np.arange(5))
    assert float(jnp.max(dists)) < 1e-3
