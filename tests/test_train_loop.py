"""TrainARMLoop integration: artifacts + interrupt/resume round trip
(reference ``tests/test_train_loop.py``)."""
import os

import numpy as np
import pytest

import mimikit_tpu as mmk

from .test_utils import TestARM, make_db_config


def _make_net(extractor):
    return TestARM(
        TestARM.Config(
            io_spec=mmk.IOSpec(
                inputs=(
                    mmk.InputSpec(
                        extractor_name=extractor.name,
                        transform=mmk.Normalize(),
                        module=mmk.LinearIO(),
                    ).bind_to(extractor),
                ),
                targets=(
                    mmk.TargetSpec(
                        extractor_name=extractor.name,
                        transform=mmk.Normalize(),
                        module=mmk.LinearIO(),
                        objective=mmk.Objective("reconstruction"),
                    ).bind_to(extractor),
                ),
            )
        )
    )


def test_should_run(tmp_path):
    ds_cfg = make_db_config(tmp_path, filename="train-loop.h5")
    db = ds_cfg.create(mode="w")
    net = _make_net(ds_cfg.extractors[0])
    config = mmk.TrainARMConfig(
        root_dir=str(tmp_path),
        limit_train_batches=4,
        max_epochs=4,
        every_n_epochs=1,
        CHECKPOINT_TRAINING=True,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="wav",
        prompt_length_sec=0.01,
        outputs_duration_sec=0.01,
        n_examples=2,
    )
    loop = mmk.TrainARMLoop.from_config(config, dataset=db, network=net)
    loop.run()

    content = os.listdir(os.path.join(str(tmp_path), loop.hash_))
    for expected in ("hp.yaml", "outputs", "epoch=1.ckpt"):
        assert expected in content
    outputs = os.listdir(os.path.join(str(tmp_path), loop.hash_, "outputs"))
    assert ".wav" in {os.path.splitext(o)[-1] for o in outputs}


@pytest.mark.parametrize("save_optimizer", [True, False])
def test_should_resume_from_checkpoint(tmp_path, save_optimizer):
    ds_cfg = make_db_config(tmp_path, filename="train-loop.h5")
    db = ds_cfg.create(mode="w")
    net = _make_net(ds_cfg.extractors[0])
    config = mmk.TrainARMConfig(
        root_dir=str(tmp_path),
        limit_train_batches=2,
        max_epochs=2,
        every_n_epochs=1,
        save_optimizer=save_optimizer,
        CHECKPOINT_TRAINING=True,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="wav",
        prompt_length_sec=0.01,
        outputs_duration_sec=0.01,
        n_examples=1,
    )
    loop = mmk.TrainARMLoop.from_config(config, dataset=db, network=net)

    def on_epoch_end(*args):
        raise KeyboardInterrupt()

    loop.on_train_epoch_end = on_epoch_end
    loop.run()
    loop.teardown("fit")

    content = os.listdir(os.path.join(str(tmp_path), loop.hash_))
    must_contain = ["hp.yaml", "outputs", "epoch=1.ckpt"]
    if save_optimizer:
        must_contain += ["epoch=1.opt"]
    for expected in must_contain:
        assert expected in content

    ckpt = mmk.Checkpoint(id=loop.hash_, epoch=1, root_dir=str(tmp_path))
    if save_optimizer:
        assert ckpt.optimizer_state is not None
    assert ckpt.trainer_state is not None

    ckpt_loop = mmk.TrainARMLoop.from_checkpoint(ckpt)
    assert isinstance(ckpt_loop, mmk.TrainARMLoop)
    ckpt_loop.run()

    content = os.listdir(os.path.join(str(tmp_path), loop.hash_))
    must_contain = ["epoch=2.ckpt"]
    if save_optimizer:
        must_contain += ["epoch=2.opt"]
    for expected in must_contain:
        assert expected in content


def test_accumulate_grad_batches(tmp_path):
    """lightning-style micro-batching: grads average across k batches
    inside the single jitted step (optax.MultiSteps)."""
    ds_cfg = make_db_config(tmp_path, filename="acc.h5")
    db = ds_cfg.create(mode="w")
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16),
        extractor=ds_cfg.extractors[0],
    )
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(4, 2, 2), hidden_dim=16, io_spec=io)
    )
    cfg = mmk.TrainARMConfig(
        root_dir=str(tmp_path),
        batch_size=4,
        batch_length=16,
        limit_train_batches=4,
        max_epochs=1,
        every_n_epochs=1,
        CHECKPOINT_TRAINING=True,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="",
        trainer_kwargs={"accumulate_grad_batches": 2},
    )
    loop = mmk.TrainARMLoop.from_config(cfg, dataset=db, network=net)
    loop.run()
    import os

    assert "epoch=1.ckpt" in os.listdir(os.path.join(str(tmp_path), loop.hash_))


def test_fused_device_batched_training(tmp_path):
    """Device batching without TBPTT goes through the fused single-dispatch
    step (gather + rng + step + metric accumulation in one jitted call)."""
    ds_cfg = make_db_config(tmp_path, filename="fused.h5")
    db = ds_cfg.create(mode="w")
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16),
        extractor=ds_cfg.extractors[0],
    )
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(4, 2, 2), hidden_dim=16, io_spec=io)
    )
    cfg = mmk.TrainARMConfig(
        root_dir=str(tmp_path),
        batch_size=4,
        batch_length=16,
        limit_train_batches=4,
        max_epochs=2,
        every_n_epochs=1,
        CHECKPOINT_TRAINING=True,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="",
        trainer_kwargs={"device_batching": True},
    )
    loop = mmk.TrainARMLoop.from_config(cfg, dataset=db, network=net)
    loop.run()
    assert loop._fused_step_fn is not None  # the fused path was built
    import os

    assert "epoch=2.ckpt" in os.listdir(os.path.join(str(tmp_path), loop.hash_))
    # metrics accumulated across the fused steps
    assert np.isfinite(loop.metrics.averages().get("loss", np.nan))


def test_fused_deferred_metrics_flush_every_epoch(tmp_path):
    """The fused path defers each epoch's metric read by one epoch (the
    read then overlaps the next epoch's device work instead of draining
    the dispatch queue).  Every epoch must still be flushed exactly once,
    labelled with ITS index, in order."""
    ds_cfg = make_db_config(tmp_path, filename="defm.h5")
    db = ds_cfg.create(mode="w")
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16),
        extractor=ds_cfg.extractors[0],
    )
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(4, 2, 2), hidden_dim=16, io_spec=io)
    )
    cfg = mmk.TrainARMConfig(
        root_dir=str(tmp_path),
        batch_size=4,
        batch_length=16,
        limit_train_batches=4,
        max_epochs=3,
        every_n_epochs=100,
        CHECKPOINT_TRAINING=False,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="",
        trainer_kwargs={"device_batching": True},
    )
    loop = mmk.TrainARMLoop.from_config(cfg, dataset=db, network=net)
    flushed = []
    orig = loop.metrics.flush_epoch
    loop.metrics.flush_epoch = lambda e, logger=None: flushed.append(
        (e, orig(e, logger=logger))
    )
    loop.run()
    assert [e for e, _ in flushed] == [1, 2, 3]
    assert all(np.isfinite(a.get("loss", np.nan)) for _, a in flushed)


def test_fused_with_tbptt_matches_checkpointing(tmp_path):
    """TBPTT + device batching also runs fused (hidden reset at chunk
    boundaries happens host-side between dispatches)."""
    ds_cfg = make_db_config(tmp_path, n_samples=8000, filename="fusedtb.h5")
    db = ds_cfg.create(mode="w")
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16),
        extractor=ds_cfg.extractors[0],
    )
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(4, 2, 2), hidden_dim=16, io_spec=io)
    )
    cfg = mmk.TrainARMConfig(
        root_dir=str(tmp_path),
        batch_size=2,
        batch_length=32,
        tbptt_chunk_length=512,
        limit_train_batches=8,
        max_epochs=1,
        every_n_epochs=1,
        CHECKPOINT_TRAINING=True,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="",
        trainer_kwargs={"device_batching": True},
    )
    loop = mmk.TrainARMLoop.from_config(cfg, dataset=db, network=net)
    loop.run()
    import os

    assert "epoch=1.ckpt" in os.listdir(os.path.join(str(tmp_path), loop.hash_))


def test_device_batcher_sampling_jitter(tmp_path):
    """cfg.sampling_jitter must reach the device batcher: jittered window
    starts deviate from the unjittered schedule but stay in bounds
    (mirrors the reference's serve(sampling_jitter=...) semantics)."""
    import numpy as np

    from .test_utils import make_db_config
    from mimikit_tpu.loops.device_loader import make_train_loader

    ds_cfg = make_db_config(tmp_path, filename="jit.h5")
    db = ds_cfg.create(mode="w")
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16),
        extractor=ds_cfg.extractors[0],
    )
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(4, 2, 2), hidden_dim=16, io_spec=io)
    )

    def batches(jitter, seed=123):
        cfg = mmk.TrainARMConfig(
            batch_size=4, batch_length=32, sampling_jitter=jitter
        )
        loader = make_train_loader(db, net, cfg)
        loader._rng = np.random.RandomState(seed)
        return [np.asarray(b) for b in loader._index_batches()][:8]

    plain = batches(0)
    jittered = batches(8)
    assert any(not np.array_equal(a, b) for a, b in zip(plain, jittered))
    n_items = make_train_loader(
        db, net, mmk.TrainARMConfig(batch_size=4, batch_length=32)
    ).n_items
    for b in jittered:
        assert b.min() >= 0 and b.max() < n_items


def test_beta_scheduler_shapes_and_training_step():
    """BetaScheduler (reference loops/beta_scheduler.py): cosine
    initial -> max -> min phases over Adam's b1, wired via
    optax.inject_hyperparams."""
    import jax
    import jax.numpy as jnp

    from mimikit_tpu.loops.beta_scheduler import (
        adam_with_beta_schedule,
        beta_schedule,
    )

    sched = beta_schedule(max_beta=0.9, total_steps=100, pct_start=0.3)
    assert abs(sched(0) - 0.9 / 25.0) < 1e-9          # initial
    assert abs(sched(30) - 0.9) < 1e-9                # peak at pct_start
    assert sched(100) < sched(0)                      # final below initial
    vals = [sched(s) for s in range(101)]
    peak = max(range(101), key=lambda s: vals[s])
    assert peak == 30
    assert all(b <= 0.9 + 1e-9 for b in vals)

    tx, schedule_fn = adam_with_beta_schedule(
        1e-2, max_beta=0.9, total_steps=10
    )
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    for step in range(3):
        state.hyperparams.update(
            {k: jnp.asarray(v) for k, v in schedule_fn(step).items()}
        )
        grads = {"w": jnp.full((4,), 0.5)}
        updates, state = tx.update(grads, state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates
        )
    assert bool(jnp.all(jnp.isfinite(params["w"])))
    assert float(params["w"][0]) < 1.0  # it actually descended


def test_gradient_clip_val_bounds_update():
    """trainer_kwargs={"gradient_clip_val": c} chains
    optax.clip_by_global_norm in front of Adam — the same knob the
    reference exposes through its Lightning Trainer kwargs.  A huge
    gradient must produce the same step a unit-norm gradient would
    (Adam normalizes per-element AFTER the global clip)."""
    import jax.numpy as jnp

    from mimikit_tpu.loops.train_loops import TrainARMConfig, TrainARMLoop

    class _DL:
        def __len__(self):
            return 4

    cfg = TrainARMConfig(
        root_dir="/tmp", max_epochs=1,
        trainer_kwargs={"gradient_clip_val": 1.0},
    )
    tx = TrainARMLoop.get_optimizer(None, _DL(), cfg)
    params = {"w": jnp.zeros((8,))}
    state = tx.init(params)
    big = {"w": jnp.full((8,), 1e6)}
    upd, _ = tx.update(big, state, params)
    small = {"w": jnp.full((8,), 1.0)}
    upd2, _ = tx.update(small, tx.init(params), params)
    # both gradients point the same way; after the global-norm clip they
    # are proportional, and Adam's per-element normalization makes the
    # resulting updates identical (and finite)
    assert bool(jnp.all(jnp.isfinite(upd["w"])))
    assert jnp.allclose(upd["w"], upd2["w"], rtol=1e-5)


def test_flat_optimizer_bit_exact_and_state_ravel():
    """mimikit_tpu/optim.py: the raveled-single-kernel optimizer computes
    the SAME update the per-leaf one does (elementwise math over the same
    values), including through MultiSteps accumulation; tree-form saved
    states convert losslessly."""
    import jax
    import jax.numpy as jnp
    import optax

    from mimikit_tpu.optim import (
        can_flatten,
        flat_optimizer,
        ravel_restored_state,
    )

    rng = np.random.RandomState(0)
    params = {
        "a": {"w": jnp.asarray(rng.randn(7, 5), jnp.float32),
              "b": jnp.asarray(rng.randn(5), jnp.float32)},
        "c": jnp.asarray(rng.randn(3, 5), jnp.float32),
    }
    assert can_flatten(params)
    assert not can_flatten(
        {"x": jnp.zeros((2,), jnp.float32), "y": jnp.zeros((2,), jnp.int32)}
    )

    sched = optax.cosine_onecycle_schedule(20, 1e-2, 0.3)
    for wrap_multi in (False, True):
        tx = optax.chain(
            optax.clip_by_global_norm(1.0), optax.adam(sched)
        )
        if wrap_multi:
            tx = optax.MultiSteps(tx, every_k_schedule=2)
        ftx = flat_optimizer(tx, params)
        p_t, p_f = params, params
        s_t, s_f = tx.init(params), ftx.init(params)
        for step in range(5):
            g = jax.tree_util.tree_map(
                lambda p: jnp.asarray(
                    np.random.RandomState(step).randn(*p.shape), p.dtype
                ),
                params,
            )
            u_t, s_t = tx.update(g, s_t, p_t)
            u_f, s_f = ftx.update(g, s_f, p_f)
            p_t = optax.apply_updates(p_t, u_t)
            p_f = optax.apply_updates(p_f, u_f)
        for lt, lf in zip(
            jax.tree_util.tree_leaves(p_t), jax.tree_util.tree_leaves(p_f)
        ):
            assert lt.shape == lf.shape
            # clip_by_global_norm sums squares in a different order on the
            # flat vector (one reduction) than on the tree (per-leaf then
            # total) — a <=1-ULP rounding difference; everything else in
            # the chain is elementwise and exact
            np.testing.assert_allclose(
                np.asarray(lt), np.asarray(lf), rtol=0, atol=1e-7
            )

    # tree-form state (saved by the unwrapped optimizer) ravels into the
    # flat layout and continues identically
    tx = optax.adam(1e-3)
    s_tree = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    u, s_tree = tx.update(g, s_tree, params)
    p_after = optax.apply_updates(params, u)
    ftx = flat_optimizer(tx, params)
    s_conv = ravel_restored_state(s_tree, params)
    # one more step from the converted state == one more step from the tree
    u2_t, _ = tx.update(g, s_tree, p_after)
    u2_f, _ = ftx.update(g, s_conv, p_after)
    for lt, lf in zip(
        jax.tree_util.tree_leaves(optax.apply_updates(p_after, u2_t)),
        jax.tree_util.tree_leaves(optax.apply_updates(p_after, u2_f)),
    ):
        np.testing.assert_array_equal(np.asarray(lt), np.asarray(lf))


def test_loop_engages_flat_optimizer(tmp_path):
    """The single-device loop must actually run the raveled optimizer:
    the Adam moments in opt_state are ONE flat leaf, not a param tree
    (guards against a gate regression silently restoring 50+ per-leaf
    update kernels)."""
    import jax
    import optax

    ds_cfg = make_db_config(tmp_path, filename="flat-opt.h5")
    db = ds_cfg.create(mode="w")
    net = _make_net(ds_cfg.extractors[0])
    config = mmk.TrainARMConfig(
        root_dir=str(tmp_path),
        limit_train_batches=2,
        max_epochs=1,
        CHECKPOINT_TRAINING=False,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="",
    )
    loop = mmk.TrainARMLoop.from_config(config, dataset=db, network=net)
    loop.run()
    n_param_leaves = len(jax.tree_util.tree_leaves(net.params))
    assert n_param_leaves > 1
    adam_states = [
        s for s in jax.tree_util.tree_leaves(
            loop.opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
        )
        if isinstance(s, optax.ScaleByAdamState)
    ]
    assert adam_states, "no adam state found in opt_state"
    assert len(jax.tree_util.tree_leaves(adam_states[0].mu)) == 1

    # opt-out flag restores the per-leaf layout
    net2 = _make_net(ds_cfg.extractors[0])
    config2 = mmk.TrainARMConfig(
        root_dir=str(tmp_path),
        limit_train_batches=2,
        max_epochs=1,
        CHECKPOINT_TRAINING=False,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="",
        trainer_kwargs={"flat_optimizer": False},
    )
    loop2 = mmk.TrainARMLoop.from_config(config2, dataset=db, network=net2)
    loop2.run()
    adam_states2 = [
        s for s in jax.tree_util.tree_leaves(
            loop2.opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
        )
        if isinstance(s, optax.ScaleByAdamState)
    ]
    assert len(jax.tree_util.tree_leaves(adam_states2[0].mu)) == n_param_leaves


def test_remat_step_matches_plain(tmp_path):
    """trainer_kwargs={"remat": ...} rematerializes the forward inside the
    backward (jax.checkpoint) — an HBM-for-FLOPs trade that must not change
    the training trajectory.  Fresh nets share PRNGKey(0), so two loops over
    the same dataset are comparable leaf-by-leaf."""
    import jax

    ds_cfg = make_db_config(tmp_path, filename="remat.h5")
    db = ds_cfg.create(mode="w")

    def run(remat):
        net = _make_net(ds_cfg.extractors[0])
        config = mmk.TrainARMConfig(
            root_dir=str(tmp_path),
            limit_train_batches=3,
            max_epochs=2,
            CHECKPOINT_TRAINING=False,
            MONITOR_TRAINING=False,
            OUTPUT_TRAINING="",
            trainer_kwargs=dict(
                {"remat": remat} if remat else {}, data_seed=7
            ),
        )
        mmk.TrainARMLoop.from_config(config, dataset=db, network=net).run()
        return jax.device_get(net.params)

    plain = run(False)
    for remat in (True, "dots_saveable"):
        rematted = run(remat)
        for a, b in zip(
            jax.tree_util.tree_leaves(plain),
            jax.tree_util.tree_leaves(rematted),
        ):
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_flat_optimizer_guards_and_round_trips():
    """The review-hardened edges: no double wrap, single-leaf trees still
    convert shape-correctly, and flat-saved states expand back for
    per-leaf (mesh / opted-out) resume."""
    import jax
    import jax.numpy as jnp
    import optax

    from mimikit_tpu.optim import (
        FlatOptimizer,
        flat_optimizer,
        ravel_restored_state,
        unravel_restored_state,
    )

    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
    ftx = flat_optimizer(optax.adam(1e-3), params)
    assert isinstance(ftx, FlatOptimizer)
    with pytest.raises(ValueError):
        flat_optimizer(ftx, params)

    # flat state -> per-leaf state -> flat state round trip
    s_flat = ftx.init(params)
    s_tree = unravel_restored_state(s_flat, params)
    mu_leaves = [
        s for s in jax.tree_util.tree_leaves(
            s_tree, is_leaf=lambda x: isinstance(x, dict)
        )
        if isinstance(s, dict)
    ]
    assert mu_leaves, "flat mu was not expanded into the param tree"
    tx = optax.adam(1e-3)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    u, _ = tx.update(g, s_tree, params)  # per-leaf tx accepts it
    s_back = ravel_restored_state(s_tree, params)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_back), jax.tree_util.tree_leaves(s_flat)
    ):
        assert np.asarray(a).shape == np.asarray(b).shape

    # single-leaf MULTI-DIM param tree: tree-form state must still ravel
    # (the old num_leaves<=1 early-return skipped it), scalars untouched
    p1 = {"w": jnp.ones((4, 3))}
    tx1 = optax.adam(1e-3)
    s1_tree = tx1.init(p1)
    s1_flat = ravel_restored_state(s1_tree, p1)
    f1 = flat_optimizer(optax.adam(1e-3), p1)
    u1, _ = f1.update(
        jax.tree_util.tree_map(jnp.ones_like, p1), s1_flat, p1
    )
    assert u1["w"].shape == (4, 3)


def test_user_supplied_optimizer_is_not_wrapped(tmp_path):
    """TrainARMLoop.from_config(opt=...) must use the transform as given —
    layout-dependent user optimizers (multi_transform, adafactor) would
    break or silently change numerics if raveled."""
    import jax
    import optax

    from mimikit_tpu.optim import FlatOptimizer

    ds_cfg = make_db_config(tmp_path, filename="useropt.h5")
    db = ds_cfg.create(mode="w")
    net = _make_net(ds_cfg.extractors[0])
    config = mmk.TrainARMConfig(
        root_dir=str(tmp_path),
        limit_train_batches=2,
        max_epochs=1,
        CHECKPOINT_TRAINING=False,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="",
    )
    user_tx = optax.adam(1e-3)
    loop = mmk.TrainARMLoop.from_config(config, dataset=db, network=net, opt=user_tx)
    loop.run()
    assert loop.opt is user_tx
    assert not isinstance(loop.opt, FlatOptimizer)
    # per-leaf state layout preserved
    adam_states = [
        s for s in jax.tree_util.tree_leaves(
            loop.opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
        )
        if isinstance(s, optax.ScaleByAdamState)
    ]
    assert len(jax.tree_util.tree_leaves(adam_states[0].mu)) == len(
        jax.tree_util.tree_leaves(net.params)
    )


def test_rerun_after_interrupt_does_not_double_wrap(tmp_path):
    """run() twice on the same loop object (notebook interrupt-and-resume
    pattern) must not re-wrap the already-flat optimizer."""
    ds_cfg = make_db_config(tmp_path, filename="rerun.h5")
    db = ds_cfg.create(mode="w")
    net = _make_net(ds_cfg.extractors[0])
    config = mmk.TrainARMConfig(
        root_dir=str(tmp_path),
        limit_train_batches=2,
        max_epochs=1,
        CHECKPOINT_TRAINING=False,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="",
    )
    loop = mmk.TrainARMLoop.from_config(config, dataset=db, network=net)
    loop.run()
    loop.run()  # crashed at first step trace before the double-wrap guard
    assert np.isfinite(loop.metrics.averages().get("loss", np.nan))
