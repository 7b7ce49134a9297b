"""Training loop: jitted optax train step, TBPTT, checkpoints, monitoring.

Rebuild of ``/root/reference/mimikit/loops/train_loops.py`` without
pytorch-lightning: the loop drives its own epochs.  The hot path is a single
jitted step — forward, loss, grads, Adam+OneCycle update — with the RNN
hidden state threaded explicitly (TBPTT: carries persist across contiguous
batches, reset at chunk boundaries, never back-propagated across steps).

Data-parallel scaling: pass ``mesh`` (a 1-D ``jax.sharding.Mesh`` over a
'data' axis) and the step is jitted with the batch sharded across devices and
params replicated — XLA inserts the gradient all-reduce over ICI.
"""
from __future__ import annotations

import dataclasses as dtc
import hashlib
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..optim import (
    FlatOptimizer,
    can_flatten,
    flat_optimizer,
    ravel_restored_state,
    unravel_restored_state,
)
from ..features.dataset import DatasetConfig
from ..features.item_spec import ItemSpec
from ..data.samplers import TBPTTSampler
from .callbacks import GenerateCallback, MMKCheckpoint, tqdm
from .logger import EpochMetrics
from .generate import EncodeDecodeLoop, GenerateLoopV2

__all__ = ["TrainARMConfig", "ARMHP", "TrainARMLoop"]


@dtc.dataclass
class TrainARMConfig(Config):
    root_dir: str = "./trainings"
    batch_size: int = 16
    batch_length: int = 32
    downsampling: int = 1
    oversampling: int = 1
    sampling_jitter: int = 0
    shift_error: int = 0
    tbptt_chunk_length: Optional[int] = None

    max_epochs: int = 2
    limit_train_batches: Optional[int] = None
    max_lr: float = 5e-4
    betas: Tuple[float, float] = (0.9, 0.93)
    div_factor: float = 3.0
    final_div_factor: float = 1.0
    pct_start: float = 0.0
    cycle_momentum: bool = False

    CHECKPOINT_TRAINING: bool = True
    MONITOR_TRAINING: bool = True
    OUTPUT_TRAINING: str = ""

    save_optimizer: bool = False
    every_n_epochs: int = 2
    n_examples: int = 3
    prompt_length_sec: float = 0.5
    outputs_duration_sec: float = 1.0
    temperature: Optional[Tuple[float, ...]] = None
    trainer_kwargs: Dict = dtc.field(default_factory=dict)


@dtc.dataclass
class ARMHP(Config):
    dataset: DatasetConfig
    network: object  # NetworkConfig (typed via its own tag)
    training: TrainARMConfig


class TrainARMLoop:
    """Owns the dataloader, optimizer, jitted step, callbacks and run dirs."""

    @classmethod
    def get_os_paths(cls, cfg: ARMHP) -> Tuple[str, str, str]:
        yaml_str = cfg.serialize()
        hash_ = hashlib.sha256(yaml_str.encode("utf-8")).hexdigest()[:8]
        root_dir = os.path.join(cfg.training.root_dir, hash_)
        output_dir = os.path.join(root_dir, "outputs")
        filename_template = os.path.join(
            output_dir, "epoch{epoch}_prm{prompt_idx}.wav"
        )
        return root_dir, hash_, filename_template

    @classmethod
    def get_dataloader(cls, dataset, net, cfg: TrainARMConfig):
        # Device batching (default ON): feature arrays upload once, batches
        # gather on device, and the loop scans steps_per_dispatch steps per
        # dispatch — the TPU-native replacement for the reference's worker
        # processes.  Batches are bit-identical to the host loader's
        # (tests/test_ops.py); falls back automatically when a transform has
        # no jax path.  Opt out: trainer_kwargs={"device_batching": False}.
        if cfg.trainer_kwargs.get("device_batching", True):
            from .device_loader import make_train_loader

            return cls._apply_data_seed(
                make_train_loader(dataset, net, cfg, prefer_device=True), cfg
            )
        user_spec = ItemSpec(
            shift=0,
            length=cfg.batch_length,
            stride=cfg.downsampling,
            unit=net.config.io_spec.unit,
        )
        batch = net.train_batch(user_spec)
        if cfg.tbptt_chunk_length is not None:
            N = dataset.signal.shape[0]
            loader_kwargs = dict(
                batch_sampler=TBPTTSampler(
                    N,
                    batch_size=cfg.batch_size,
                    chunk_length=cfg.tbptt_chunk_length,
                    seq_len=cfg.batch_length,
                    oversampling=cfg.oversampling,
                )
            )
        else:
            loader_kwargs = dict(batch_size=cfg.batch_size, shuffle=True)
        return cls._apply_data_seed(
            dataset.serve(
                batch, sampling_jitter=cfg.sampling_jitter, **loader_kwargs
            ),
            cfg,
        )

    @staticmethod
    def _apply_data_seed(loader, cfg: TrainARMConfig):
        """trainer_kwargs={"data_seed": N} pins the batch-sampling RNG for
        reproducible trajectories (samplers otherwise seed from OS entropy,
        matching the reference's unseeded DataLoader shuffle).

        Per-RUN semantics: a resumed run restarts the seeded stream from
        epoch 1's permutation — it reproduces a fresh run with the same
        seed, not the uninterrupted run's tail."""
        seed = cfg.trainer_kwargs.get("data_seed")
        if seed is not None:
            seeded = False
            for obj in (
                loader,
                getattr(loader, "batch_sampler", None),
                getattr(loader, "sampler", None),
            ):
                if obj is not None and hasattr(obj, "_rng"):
                    obj._rng = np.random.RandomState(int(seed))
                    seeded = True
            if not seeded:
                # silently unseeded batch order would look reproducible
                # while being OS-entropy-driven (advisor r3)
                import warnings

                warnings.warn(
                    "data_seed was set but the loader exposes no seedable"
                    " sampler RNG (user-supplied batch_sampler?) — batch"
                    " order will NOT be reproducible",
                    stacklevel=3,
                )
        return loader

    @classmethod
    def get_optimizer(cls, net, dl, cfg: TrainARMConfig):
        steps_per_epoch = (
            min(len(dl), cfg.limit_train_batches)
            if cfg.limit_train_batches is not None
            else len(dl)
        )
        accumulate = int(cfg.trainer_kwargs.get("accumulate_grad_batches", 1))
        # the schedule ticks once per optimizer update, not per micro-batch
        total_steps = max(2, steps_per_epoch * cfg.max_epochs // accumulate)
        # a zero-length warmup phase divides by zero inside optax's schedule
        # (the reference's torch OneCycleLR tolerates pct_start=0) — floor the
        # warmup at one step
        pct_start = max(cfg.pct_start, 1.0 / total_steps + 1e-9)
        schedule = optax.cosine_onecycle_schedule(
            transition_steps=total_steps,
            peak_value=cfg.max_lr,
            pct_start=pct_start,
            div_factor=cfg.div_factor,
            final_div_factor=cfg.final_div_factor,
        )
        tx = optax.adam(schedule, b1=cfg.betas[0], b2=cfg.betas[1])
        clip = cfg.trainer_kwargs.get("gradient_clip_val")
        if clip:
            # same knob the reference exposes through its Lightning
            # Trainer kwargs (reference mimikit/loops/train_loops.py:
            # trainer_kwargs -> pl.Trainer(gradient_clip_val=...)).
            # Bounds the infinite-margin memorization regime where a
            # fully-memorized discrete target drives logits unboundedly
            # (see mimikit_tpu/precision.py — bf16 trips there a little
            # before f32 does, same trajectory).
            tx = optax.chain(optax.clip_by_global_norm(float(clip)), tx)
        if accumulate > 1:
            # lightning-style micro-batching: grads average over N steps,
            # params update every Nth (stays inside the single jitted step)
            tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
        return tx

    @classmethod
    def from_config(cls, train_cfg: TrainARMConfig, dataset, network, opt=None):
        dataloader = cls.get_dataloader(dataset, network, train_cfg)
        ds_cfg = (
            dataset.config
            if getattr(dataset, "config", None) is not None
            else DatasetConfig(filename=dataset.filename, sources=tuple(dataset.index))
        )
        hp = ARMHP(training=train_cfg, network=network.config, dataset=ds_cfg)
        return cls(hp, dataset, dataloader, network, network.config.io_spec.loss_fn, opt)

    @classmethod
    def from_checkpoint(cls, checkpoint) -> "TrainARMLoop":
        dataset, network = checkpoint.dataset, checkpoint.network
        train_cfg = checkpoint.training_config
        dataloader = cls.get_dataloader(dataset, network, train_cfg)
        loop = cls(
            ARMHP(
                training=train_cfg,
                network=network.config,
                dataset=checkpoint.dataset_config,
            ),
            dataset,
            dataloader,
            network,
            network.config.io_spec.loss_fn,
        )
        loop._restored_opt_state = checkpoint.optimizer_state
        ts = checkpoint.trainer_state
        if ts is not None:
            loop.start_epoch = int(ts["fit_loop"]["epoch"])
            loop.global_step = int(ts["fit_loop"].get("global_step", 0))
        return loop

    def __init__(self, hp: ARMHP, dataset, loader, net, loss_fn, opt=None, mesh=None):
        self._config = hp
        self.train_cfg = hp.training
        if mesh is None and self.train_cfg.trainer_kwargs.get("data_parallel"):
            # shard batches over all available devices (gradient all-reduce
            # over ICI inserted by XLA)
            from ..parallel.mesh import make_mesh

            n_model = int(self.train_cfg.trainer_kwargs.get("n_model", 1))
            mesh = make_mesh(n_model=n_model)
        self.root_dir, self.hash_, self.output_template = self.get_os_paths(hp)
        self.dataset = dataset
        self.loader = loader
        self.loss_fn = loss_fn
        self.net = net
        self.mesh = mesh
        self.tbptt_len = self.train_cfg.tbptt_chunk_length
        if self.tbptt_len is not None:
            self.tbptt_len //= self.train_cfg.batch_length
        self.opt = opt
        # user-supplied optimizers are used as-is: the flat rewrap is only
        # safe for elementwise transforms (see mimikit_tpu/optim.py)
        self._opt_user_supplied = opt is not None
        self.opt_state = None
        self.global_step = 0
        self.start_epoch = 0
        self.metrics = EpochMetrics()
        self._restored_opt_state = None
        self._step_fn = None
        self.callbacks = self.get_callbacks(
            net, dataset, self.root_dir, self.output_template, self.train_cfg
        )

    @property
    def config(self) -> ARMHP:
        return self._config

    @classmethod
    def get_callbacks(cls, net, dataset, root_dir, filename_template, cfg):
        callbacks = []
        if cfg.CHECKPOINT_TRAINING:
            callbacks.append(
                MMKCheckpoint(epochs=cfg.every_n_epochs, root_dir=root_dir)
            )
        if cfg.MONITOR_TRAINING or cfg.OUTPUT_TRAINING:
            from ..networks.arm import ARM

            if isinstance(net, ARM):
                gen_loop = GenerateLoopV2.from_config(
                    GenerateLoopV2.Config(
                        output_duration_sec=cfg.outputs_duration_sec,
                        prompts_length_sec=cfg.prompt_length_sec,
                        prompts_position_sec=(None,) * cfg.n_examples,
                        parameters=dict(temperature=cfg.temperature),
                        batch_size=cfg.n_examples,
                        downsampling=cfg.downsampling,
                        output_name_template=filename_template,
                        display_waveform=cfg.MONITOR_TRAINING,
                        write_waveform=bool(cfg.OUTPUT_TRAINING),
                    ),
                    dataset=dataset,
                    network=net,
                )
            else:
                gen_loop = EncodeDecodeLoop.from_config(
                    EncodeDecodeLoop.Config(
                        prompts_length_sec=max(
                            cfg.prompt_length_sec, cfg.outputs_duration_sec
                        ),
                        prompts_position_sec=(None,) * cfg.n_examples,
                        parameters=dict(temperature=cfg.temperature),
                        batch_size=cfg.n_examples,
                        downsampling=cfg.downsampling,
                        output_name_template=filename_template,
                        display_waveform=cfg.MONITOR_TRAINING,
                        write_waveform=bool(cfg.OUTPUT_TRAINING),
                    ),
                    dataset=dataset,
                    network=net,
                )
            callbacks.append(
                GenerateCallback(
                    generate_loop=gen_loop, every_n_epochs=cfg.every_n_epochs
                )
            )
        return callbacks

    # -- the jitted step ----------------------------------------------------
    def _build_step(self):
        from .. import precision as _prec

        module = self.net.module
        loss_fn = self.loss_fn
        tx = self.opt
        # trainer_kwargs={"matmul_precision": "bfloat16"} trades precision for
        # MXU throughput on the whole step (weights stay f32).  NOTE: on TPU
        # the f32 default is ALREADY the single-pass bf16 multiply, so this
        # knob only matters for "float32"/"highest" (3-pass) — for real
        # mixed-precision gains use param_dtype below.
        precision = self.train_cfg.trainer_kwargs.get("matmul_precision")
        # trainer_kwargs={"param_dtype": "bfloat16"}: true mixed precision —
        # f32 master params + optimizer state, bf16 compute (params,
        # activations and backward all bf16: half the HBM traffic, double
        # the MXU rate).  The cast happens inside the traced step; grads
        # re-cast to f32 at the convert_element_type boundary; the loss is
        # computed in f32 (mimikit_tpu/precision.py).
        half = _prec.resolve_dtype(
            self.train_cfg.trainer_kwargs.get("param_dtype")
        )
        # trainer_kwargs={"remat": True} rematerializes the forward in the
        # backward pass (jax.checkpoint) instead of keeping every activation
        # live in HBM — the standard TPU trade of MXU FLOPs for memory, for
        # batch_length/batch_size combinations whose activations exceed the
        # chip's 16 GB.  A string selects a jax.checkpoint_policies member
        # (e.g. "dots_saveable" keeps matmul outputs and replays only the
        # cheap elementwise chain).  Identical numerics either way (pinned
        # in tests/test_train_loop.py); the reference has no equivalent —
        # torch's checkpointing is opt-in per module and mimikit never
        # wires it (reference loops/train_loops.py builds a plain step).
        remat = self.train_cfg.trainer_kwargs.get("remat", False)

        def apply_train(p, inputs, hidden, rng):
            return module.apply(
                {"params": p},
                inputs,
                hidden,
                True,
                rngs={"dropout": rng, "sample": rng},
            )

        if remat:
            if isinstance(remat, str):
                policy = getattr(jax.checkpoint_policies, remat)
            elif callable(remat) and not isinstance(remat, bool):
                # an actual jax.checkpoint_policies member (advisor r3):
                # silently dropping it would remat everything instead
                policy = remat
            elif remat is True:
                policy = None
            else:
                raise TypeError(
                    "trainer_kwargs['remat'] must be True, a"
                    " jax.checkpoint_policies member name, or a policy"
                    f" callable — got {remat!r}"
                )
            # prevent_cse only matters outside jit; apply_train always runs
            # under jax.jit (+ lax.scan), where it just blocks XLA CSE
            apply_train = jax.checkpoint(
                apply_train, policy=policy, prevent_cse=False
            )

        if half is not None:
            inner_apply = apply_train

            def apply_train(p, inputs, hidden, rng):
                p = _prec.cast_floats(p, half)
                inputs = _prec.cast_floats(inputs, half)
                hidden = _prec.cast_floats(hidden, half)
                with _prec.compute(half):
                    outputs, new_hidden = inner_apply(p, inputs, hidden, rng)
                # loss runs f32; the hidden carry contract stays f32 (the
                # loop's eval_shape templates and checkpoints are f32)
                return (
                    _prec.cast_floats(outputs, jnp.float32),
                    _prec.cast_floats(new_hidden, jnp.float32),
                )

        def step(params, opt_state, hidden, inputs, targets, rng):
            if precision is not None:
                with jax.default_matmul_precision(precision):
                    return _step_body(params, opt_state, hidden, inputs, targets, rng)
            return _step_body(params, opt_state, hidden, inputs, targets, rng)

        def _step_body(params, opt_state, hidden, inputs, targets, rng):
            def compute_loss(p):
                outputs, new_hidden = apply_train(p, inputs, hidden, rng)
                # pick the cheapest safe logits barrier for the CE (see
                # loss_functions.cross_entropy): f32 steps need none
                # (bit-identical remat copies), bf16 steps barrier the
                # lossless bf16 cast — half the HBM round-trip the full
                # barrier costs
                with _prec.loss_barrier(
                    "bf16" if half is not None else None
                ):
                    d = loss_fn(outputs, targets)
                return d["loss"], (d, new_hidden)

            (loss, (d, new_hidden)), grads = jax.value_and_grad(
                compute_loss, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, new_hidden, d

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import param_shardings

            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))
            kw = self.train_cfg.trainer_kwargs
            if int(kw.get("n_model", 1)) > 1 or kw.get("fsdp"):
                p_sh = param_shardings(
                    self.mesh,
                    self.net.params,
                    min_size=int(kw.get("min_size", 4096)),
                    fsdp=bool(kw.get("fsdp")),
                )
            else:
                p_sh = repl
            self._step_fn = jax.jit(
                step,
                in_shardings=(p_sh, repl, repl, data, data, repl),
                out_shardings=(p_sh, repl, repl, repl),
            )
        else:
            self._step_fn = jax.jit(step, donate_argnums=(0, 1))

        # fused multi-step path: K batches of window gather + rng split +
        # train step + metric accumulation run as ONE lax.scan in ONE
        # dispatch, with ONE (K, B) index upload.  The per-batch loop pays
        # a host->device index transfer and several dispatches per step —
        # milliseconds each through a remote-device tunnel.
        self._fused_step_fn = None
        from .device_loader import DeviceBatcher

        if self.mesh is None and isinstance(self.loader, DeviceBatcher):
            from ..data.batch import Input, process_batch

            gather = self.loader.gather_raw
            batch_tree = self.loader.batch

            def fused(params, opt_state, hidden, metric_sums, rng, idxs):
                # ONE (K*B)-window gather + transform up front instead of a
                # per-scan-step gather: 16 small gathers serialized inside
                # the scan cost ~0.09 ms/step on v5e (gathers run far below
                # HBM bandwidth); one big gather amortizes the
                # serialization and lets the scan consume ready slices
                flat_all = jax.vmap(gather)(idxs)

                def body(carry, flat):
                    params, opt_state, hidden, metric_sums, rng = carry
                    rng, sub = jax.random.split(rng)
                    it = iter(flat)
                    inputs, targets = process_batch(
                        batch_tree,
                        lambda x: isinstance(x, Input),
                        lambda x: next(it),
                    )
                    params, opt_state, hidden, d = step(
                        params, opt_state, hidden, inputs, targets, sub
                    )
                    metric_sums = jax.tree_util.tree_map(
                        lambda a, b: a + b, metric_sums, d
                    )
                    return (
                        (params, opt_state, hidden, metric_sums, rng),
                        d["loss"],
                    )

                carry = (params, opt_state, hidden, metric_sums, rng)
                (params, opt_state, hidden, metric_sums, rng), losses = (
                    jax.lax.scan(body, carry, flat_all)
                )
                return params, opt_state, hidden, metric_sums, rng, losses[-1]

            self._fused_step_fn = jax.jit(fused, donate_argnums=(0, 1, 3))

    def _flush_pending_metrics(self):
        """Read + log the metric sums deferred from the previous epoch (the
        fused path trades epoch-end read latency for a one-epoch lag in
        the printed/logged averages; see run())."""
        pending = getattr(self, "_pending_metrics", None)
        if pending is None:
            return
        self._pending_metrics = None
        pe, sums_arr, n = pending
        sums = jax.device_get(sums_arr)
        avgs = {k: float(v) / n for k, v in sums.items()}
        self.metrics.check_loss(avgs.get("loss", 0.0))
        self.metrics.log_output(avgs)
        self.metrics.flush_epoch(pe, logger=self._loss_logger())
        # flush_epoch does not clear the accumulators — reset so the next
        # (immediate-path or deferred) flush does not mix two epochs
        self.metrics.on_epoch_start()

    def _prepare_batch(self, batch):
        (inputs, targets) = batch
        inputs = tuple(jnp.asarray(x) for x in inputs)
        targets = tuple(jnp.asarray(x) for x in targets)
        return inputs, targets

    def run(self) -> "TrainARMLoop":
        os.makedirs(self.root_dir, exist_ok=True)
        os.makedirs(os.path.join(self.root_dir, "outputs"), exist_ok=True)
        self.save_hp()
        print("*" * 64)
        print("training's id is:", self.hash_)
        print("*" * 64)

        cfg = self.train_cfg
        # initialize params lazily from the first batch
        first_batch = next(iter(self.loader))
        inputs, targets = self._prepare_batch(first_batch)
        if self.net.params is None:
            self.net._ensure_params(inputs)
        if self.opt is None:
            self.opt = self.get_optimizer(self.net, self.loader, cfg)
        # single-device: ravel the param tree so the optimizer update is ONE
        # fused kernel instead of one per leaf (53 launches -> 1 for the
        # seq2seq net; bit-exact for elementwise transforms, see
        # mimikit_tpu/optim.py).  Only the loop's own optimizer is wrapped
        # (user-supplied transforms may be layout-dependent), never twice
        # (run() can be re-entered after an interrupt), and sharded params
        # keep the per-leaf layout — raveling would undo fsdp.
        restored = self._restored_opt_state
        # consumed exactly once: the jitted step DONATES opt-state buffers,
        # so after one run the restored tree holds deleted arrays — re-runs
        # must continue from the live self.opt_state instead
        self._restored_opt_state = None
        if (
            self.mesh is None
            and not self._opt_user_supplied
            and not isinstance(self.opt, FlatOptimizer)
            and bool(cfg.trainer_kwargs.get("flat_optimizer", True))
            and can_flatten(self.net.params)
        ):
            self.opt = flat_optimizer(self.opt, self.net.params)
        if restored is not None:
            if isinstance(self.opt, FlatOptimizer):
                # states saved by the unwrapped optimizer (or an older
                # version) carry per-leaf mu/nu trees — ravel them to match
                restored = ravel_restored_state(restored, self.net.params)
            else:
                # checkpoints saved by the flat optimizer resuming onto a
                # per-leaf path (mesh/fsdp, flat_optimizer=False): expand
                # the raveled moments back into param-shaped trees
                restored = unravel_restored_state(restored, self.net.params)
            self.opt_state = restored
        elif self.opt_state is None:
            self.opt_state = self.opt.init(self.net.params)
        # else: re-entered run() — continue from the live optimizer state
        self._build_step()

        for cb in self.callbacks:
            if hasattr(cb, "on_fit_start"):
                cb.on_fit_start(self)
        self.metrics.on_fit_start()

        params = self.net.params
        hidden = None
        interrupted = False
        epoch = self.start_epoch
        self._pending_metrics = None
        # a host sync per step would cost a device round trip each time (the
        # reference's per-batch .item() equivalent); instead metrics
        # accumulate on device and the NaN guard fires periodically
        nan_check_every = int(cfg.trainer_kwargs.get("nan_check_every", 25))
        prefetched_uploads = None
        try:
            for epoch in range(self.start_epoch + 1, cfg.max_epochs + 1):
                self.metrics.on_epoch_start()
                metric_sums = None
                n_batches = 0
                fused = self._fused_step_fn is not None
                if fused:
                    rng = self.net.next_rng()
                    last_B = None
                    next_check = 0
                    pending_loss = None  # deferred NaN probe (see below)
                    bar = tqdm(
                        total=len(self.loader),
                        desc=f"Epoch {epoch}",
                        leave=False,
                        mininterval=1.0,
                    )
                    idx_uploads = (
                        prefetched_uploads
                        if prefetched_uploads is not None
                        else list(self._epoch_index_uploads(cfg))
                    )
                    prefetched_uploads = None
                    for idxs in idx_uploads:
                        # (K, B) device array; all same-shape groups of the
                        # epoch went up in ONE stacked transfer (a transfer
                        # costs a full round trip through a remote-device
                        # tunnel, so per-dispatch uploads serialize the loop)
                        K, B = int(idxs.shape[0]), int(idxs.shape[1])
                        if n_batches == 0 or B != last_B:
                            hidden, metric0 = self._fused_shapes(B)
                            if metric_sums is None:
                                metric_sums = metric0
                        elif self.tbptt_len is not None and (
                            n_batches % self.tbptt_len
                        ) == 0:
                            hidden, _ = self._fused_shapes(B)
                        last_B = B
                        (
                            params, self.opt_state, hidden, metric_sums,
                            rng, last_loss,
                        ) = self._fused_step_fn(
                            params, self.opt_state, hidden, metric_sums,
                            rng, idxs,
                        )
                        self.global_step += K
                        n_batches += K
                        bar.update(K)
                        if n_batches >= next_check:
                            # deferred by one checkpoint: reading the loss
                            # JUST dispatched would drain the whole async
                            # dispatch queue (a tunnel value read returns
                            # only after every queued step completes); the
                            # PREVIOUS checkpoint's loss has long finished,
                            # so its read overlaps the device's progress —
                            # NaN detection trails by nan_check_every
                            # batches, same guarantee one checkpoint later
                            if pending_loss is not None:
                                self.metrics.check_loss(float(pending_loss))
                            pending_loss = last_loss
                            next_check = n_batches + nan_check_every
                    # the trailing probe is covered by the epoch-mean read
                    # below (one NaN batch poisons the on-device sum), so no
                    # extra queue-draining value read here; instead use the
                    # still-busy device to overlap the NEXT epoch's index
                    # upload with this epoch's remaining steps (a
                    # host->device transfer costs a tunnel round trip that
                    # would otherwise serialize at the next epoch's start)
                    del pending_loss
                    if epoch < cfg.max_epochs:
                        prefetched_uploads = list(
                            self._epoch_index_uploads(cfg)
                        )
                    bar.close()
                else:
                    bar = tqdm(
                        self.loader,
                        total=len(self.loader),
                        desc=f"Epoch {epoch}",
                        leave=False,
                        mininterval=1.0,
                    )
                    for batch_idx, batch in enumerate(bar):
                        if (
                            cfg.limit_train_batches is not None
                            and batch_idx >= cfg.limit_train_batches
                        ):
                            break
                        if self.tbptt_len is not None and (
                            batch_idx % self.tbptt_len
                        ) == 0:
                            hidden = None
                        inputs, targets = self._prepare_batch(batch)
                        if hidden is None:
                            # steady-state jit caches one (hidden != None)
                            # shape: materialize zeros instead of None
                            hidden = self._zero_hidden(inputs)
                        params, self.opt_state, hidden, d = self._step_fn(
                            params, self.opt_state, hidden, inputs, targets,
                            self.net.next_rng(),
                        )
                        self.global_step += 1
                        n_batches += 1
                        metric_sums = (
                            d
                            if metric_sums is None
                            else jax.tree_util.tree_map(
                                lambda a, b: a + b, metric_sums, d
                            )
                        )
                        if (batch_idx % nan_check_every) == 0:
                            self.metrics.check_loss(float(d["loss"]))
                self.net.params = params
                if fused and epoch < cfg.max_epochs:
                    # deferred by one epoch (same trick as the NaN probe):
                    # reading THIS epoch's sums would wait for every queued
                    # step to complete before the ~35 ms tunnel round trip;
                    # the PREVIOUS epoch's sums are long computed, so their
                    # read overlaps the device's progress on this epoch.
                    # Epoch labels stay correct — only the wall-clock moment
                    # of the print/log shifts by one epoch.
                    self._flush_pending_metrics()
                    if metric_sums is not None:
                        # MMK_ASYNC_METRIC_COPY=1 starts moving the sums
                        # host-side now so next epoch's device_get finds
                        # them local.  DEFAULT OFF: measured drain-
                        # inclusive on the v5e tunnel, each copy RPC
                        # serializes against the dispatch queue and COSTS
                        # 0.57 ms/step (2.53 vs 1.96 at 256-step epochs,
                        # probe_loop_decomp r4); the deferred device_get it
                        # tries to hide is only ~24 ms/epoch.  May help on
                        # direct-attached backends — hence the knob.
                        if os.environ.get(
                            "MMK_ASYNC_METRIC_COPY", "0"
                        ) == "1":
                            for v in jax.tree_util.tree_leaves(metric_sums):
                                try:
                                    v.copy_to_host_async()
                                except Exception:  # backend-dependent
                                    break
                        self._pending_metrics = (
                            epoch, metric_sums, n_batches
                        )
                else:
                    self._flush_pending_metrics()
                    if metric_sums is not None:
                        # ONE device read for all metrics (per-key float()
                        # would pay one round trip each)
                        sums = jax.device_get(metric_sums)
                        avgs = {
                            k: float(v) / n_batches for k, v in sums.items()
                        }
                        self.metrics.check_loss(avgs.get("loss", 0.0))
                        self.metrics.log_output(avgs)
                    self.metrics.flush_epoch(
                        epoch, logger=self._loss_logger()
                    )
                for cb in self.callbacks:
                    if isinstance(cb, MMKCheckpoint):
                        cb.on_train_epoch_end(self, epoch, self.global_step)
                    elif isinstance(cb, GenerateCallback):
                        self.net.params = params
                        cb.on_train_epoch_end(self, epoch)
                # user-overridable hook (runs after callbacks, like the
                # reference's LightningModule hook ordering)
                self.on_train_epoch_end(epoch)
        except KeyboardInterrupt:
            interrupted = True
        finally:
            self._flush_pending_metrics()
            self.net.params = params
            if interrupted:
                for cb in self.callbacks:
                    if isinstance(cb, MMKCheckpoint):
                        cb.on_train_epoch_end(
                            self, epoch, self.global_step, interrupted=True
                        )
        self.metrics.on_fit_end()
        self.dataset.close()
        return self

    def _dispatch_groups(self, cfg):
        """Group the epoch's index batches into (K, B) dispatch units:
        uniform batch size, never spanning a TBPTT chunk boundary (hidden
        resets happen host-side between dispatches)."""
        G = int(cfg.trainer_kwargs.get("steps_per_dispatch", 16))
        group: list = []
        for batch_idx, idx in enumerate(self.loader._index_batches()):
            if (
                cfg.limit_train_batches is not None
                and batch_idx >= cfg.limit_train_batches
            ):
                break
            at_boundary = self.tbptt_len is not None and (
                batch_idx % self.tbptt_len
            ) == 0
            size_change = group and len(idx) != len(group[0])
            if group and (at_boundary or size_change or len(group) >= G):
                yield group
                group = []
            group.append(np.asarray(idx))
        if group:
            yield group

    def _epoch_index_uploads(self, cfg):
        """Yield the epoch's (K, B) dispatch index arrays as device arrays,
        uploading all same-shape groups in ONE stacked host->device transfer
        (then slicing on device, which is async and latency-free)."""
        groups = [
            np.asarray(g, np.int32) for g in self._dispatch_groups(cfg)
        ]
        slots: dict = {}
        by_shape: dict = {}
        for i, a in enumerate(groups):
            by_shape.setdefault(a.shape, []).append(i)
        for shape, members in by_shape.items():
            if len(members) == 1:
                slots[members[0]] = (jnp.asarray(groups[members[0]]), None)
            else:
                stacked = jnp.asarray(
                    np.stack([groups[i] for i in members])
                )
                for j, i in enumerate(members):
                    slots[i] = (stacked, j)
        for i in range(len(groups)):
            arr, j = slots[i]
            yield arr if j is None else arr[j]

    def _fused_shapes(self, batch_size: int):
        """Shape-level (hidden, metric) templates for the fused step —
        eval_shape only, nothing touches the device."""
        cache = getattr(self, "_fused_shape_cache", None)
        if cache is None:
            cache = self._fused_shape_cache = {}
        if batch_size not in cache:
            from ..data.batch import Input, process_batch

            flat = jax.eval_shape(
                self.loader.gather_raw,
                jax.ShapeDtypeStruct((batch_size,), jnp.int32),
            )
            it = iter(flat)
            inputs, targets = process_batch(
                self.loader.batch,
                lambda x: isinstance(x, Input),
                lambda x: next(it),
            )
            outputs_s, hidden_s = jax.eval_shape(
                lambda p, inp: self.net.module.apply(
                    {"params": p}, inp, None, True,
                    rngs={
                        "dropout": jax.random.PRNGKey(0),
                        "sample": jax.random.PRNGKey(0),
                    },
                ),
                self.net.params,
                inputs,
            )
            d_s = jax.eval_shape(self.loss_fn, outputs_s, targets)
            cache[batch_size] = (hidden_s, d_s)
        hidden_s, d_s = cache[batch_size]
        zeros = lambda tree: jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), tree
        )
        return zeros(hidden_s), zeros(d_s)

    def _zero_hidden(self, inputs):
        """Initial hidden carry matching the module's structure."""
        module = self.net.module
        variables = jax.eval_shape(
            lambda: module.apply(
                {"params": self.net.params}, inputs, None, False,
                rngs={
                    "dropout": jax.random.PRNGKey(0),
                    "sample": jax.random.PRNGKey(0),
                },
            )
        )
        _, hidden_shape = variables
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), hidden_shape
        )

    def _loss_logger(self):
        """Optional h5 metric logging: trainer_kwargs={"loss_logs_file": path}
        (the reference's LossLogger surface, ``logger.py:93-138``)."""
        path = self.train_cfg.trainer_kwargs.get("loss_logs_file")
        if not path:
            return None
        from .logger import LossLogger

        return LossLogger(os.path.join(self.root_dir, path))

    def on_train_epoch_end(self, *args):
        """Overridable per-epoch hook (tests monkeypatch this)."""

    def teardown(self, stage: str = "fit"):
        """API parity no-op (the loop owns no external resources)."""

    def save_hp(self):
        with open(os.path.join(self.root_dir, "hp.yaml"), "w") as fp:
            fp.write(self.config.serialize())
