"""Training orchestration.

Behavior parity with the reference train loop
(/root/reference/src/scrubvae/train/trainer.py:322-516): beta annealing,
per-epoch GR-ensemble re-init, auto-tuned lambda logging, weights every 5
epochs / full state every 20, validation (losses + generative-restrictiveness
R^2 + CV decodability) every 5 epochs from a start epoch, single metric sink.

The per-batch work is one fused jitted step (train.step); the host loop only
schedules epochs and logs.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scrubvae_tpu import factory
from scrubvae_tpu.data.dataset import StreamDataset, epoch_batches
from scrubvae_tpu.models import scrubbers as scr
from scrubvae_tpu.train import optim
from scrubvae_tpu.train.losses import balance_disentangle  # noqa: F401
from scrubvae_tpu.train.state import TrainState
from scrubvae_tpu.train.step import (
    feature_slices,
    make_eval_step,
    make_train_epoch,
    make_train_step,
)
from scrubvae_tpu.utils import checkpoint as ckpt
from scrubvae_tpu.utils.logging import MetricLogger

__all__ = ["Trainer", "train"]


def _dummy_batch(dataset, info, batch_size: int = 2) -> Dict:
    idx = jnp.arange(batch_size)
    return jax.tree.map(lambda x: x, dataset.batch(idx))


class Trainer:
    def __init__(self, config: dict, datasets: dict, model, info: dict, run=None):
        self.config = config
        self.datasets = datasets
        self.model = model
        self.info = info
        self.train_ds = datasets["train"]
        self.val_ds = datasets.get("val")

        data_cfg = config["data"]
        self.batch_size = int(data_cfg.get("batch_size") or 256)
        # Tiny datasets: a batch size above len(train) would yield zero
        # batches per epoch (drop_last) and silently log no train metrics;
        # clamp so one full-dataset batch always runs.
        self.batch_size = max(1, min(self.batch_size, len(datasets["train"])))

        # train.mesh: SPMD over a jax.sharding mesh. Accepts {"data": N},
        # {"data": N, "model": M}, an int, or true (N = -1/None/true =
        # every visible device). The global batch is sharded over the
        # "data" axis; state is replicated except the sigma head, which an
        # optional "model" axis column-shards (parallel/mesh.py TP_RULES);
        # XLA inserts gradient/moment psums (SURVEY §2.2). None/absent =
        # single device.
        mesh_cfg = config["train"].get("mesh")
        self.mesh = None
        if mesh_cfg and jax.device_count() > 1:
            from scrubvae_tpu.parallel import data_axis_size, make_mesh

            if isinstance(mesh_cfg, dict):
                spec = dict(mesh_cfg)
            elif isinstance(mesh_cfg, bool):
                spec = None
            else:
                spec = int(mesh_cfg)
                spec = None if spec == -1 else spec
            self.mesh = make_mesh(spec)
            per = data_axis_size(self.mesh)
            # static shapes: the sharded batch must divide the data axis
            if self.batch_size % per:
                self.batch_size = max(per, (self.batch_size // per) * per)
        self.loss_cfg = dict(config.get("loss") or {})
        self.dis_cfg = config["disentangle"]
        self.train_cfg = config["train"]
        self.out_path = config.get("out_path", "./")
        self.seed = int(self.train_cfg.get("seed") or 0)
        _ese = self.train_cfg.get("eval_start_epoch")
        self.eval_start_epoch = 50 if _ese is None else int(_ese)

        n = len(self.train_ds)
        self.steps_per_epoch = max(n // self.batch_size, 1)
        self.tx = optim.make_optimizer(self.train_cfg, self.steps_per_epoch)

        # Host-streaming train split (data.host_stream; data/hoststream.py):
        # the frame store lives in host RAM and per-batch slabs prefetch to
        # the device on a background thread. The step's batch_fn assembles
        # windows from the slab instead of gathering from the HBM store,
        # and the train epoch runs per-step (the scanned epoch needs the
        # whole store on device).
        from scrubvae_tpu.data.hoststream import HostStreamDataset

        self.host_stream = isinstance(self.train_ds, HostStreamDataset)
        if isinstance(self.val_ds, HostStreamDataset):
            raise ValueError(
                "host-streaming val splits are unsupported: the scanned eval "
                "epoch gathers windows inside jit, which needs the store "
                "device-resident (data.host_stream applies to the train "
                "split only; subsample the val split instead)"
            )

        rng = jax.random.PRNGKey(self.seed)
        rng, init_rng, scrub_rng = jax.random.split(rng, 3)

        dummy = self.train_ds.batch(jnp.arange(2))
        variables = self.model.init(
            {"params": init_rng, "dropout": init_rng}, dummy, rng=init_rng, train=True
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        params = self._maybe_lowp_params(params)

        self.scrub_state, self.adv_bundle = factory.init_scrub_state(
            scrub_rng,
            self.dis_cfg,
            self.loss_cfg,
            info["z_dim"],
            info["feat_dims"],
            discrete_classes=self.train_ds.discrete_classes,
        )
        adv_states = self.adv_bundle["states"] if self.adv_bundle else {}

        self.use_mcmi = "mcmi" in self.loss_cfg
        mi_state = None
        if self.use_mcmi:
            mi_state = scr.mi_init(
                jnp.zeros((self.batch_size, info["z_dim"])),
                jnp.zeros((self.batch_size, max(info["conditional_dim"], 1))),
                bandwidth=float(self.dis_cfg.get("bandwidth") or 1.0),
                var_mode=self.dis_cfg.get("var_mode") or "sphere",
                model_L=jnp.zeros(
                    (self.batch_size, info["z_dim"], info["z_dim"])
                ),
                valid=0.0,
            )

        opt_state = self.tx.init(params)
        if self._param_dtype_lowp() and not isinstance(self.tx, optim.FusedAdamW):
            raise ValueError(
                "train.param_dtype: bf16 requires the fused optimizer "
                "(stochastically-rounded weight stores); remove "
                "fused_optimizer: false or param_dtype"
            )
        self.state = TrainState.create(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            scrub_state=self.scrub_state,
            adv_states=adv_states,
            mi_state=mi_state,
            rng=rng,
        )
        self.start_epoch = int(config["model"].get("start_epoch") or 0)
        self._maybe_restore()
        if self.mesh is not None:
            from scrubvae_tpu.parallel import place_state, tp_mask

            self.state = place_state(self.state, self.mesh)
            if isinstance(self.tx, optim.FusedAdamW):
                # TP-sharded leaves take the plain-XLA elementwise update
                # (GSPMD partitions it shard-locally; the Pallas custom
                # call would force an all-gather)
                self.tx.tp_mask = tp_mask(self.state.params, self.mesh)

        self.feat_slices = feature_slices(
            info["conditional_keys"], info["feat_dims"]
        )
        common = dict(
            disentangle_config=self.dis_cfg,
            loss_keys=tuple(self.loss_cfg.keys()),
            disentangle_keys=tuple(info["disentangle_keys"]),
            conditional_keys=tuple(info["conditional_keys"]),
            feat_slices=self.feat_slices,
            adv_bundle=self.adv_bundle,
            # Static copy of the configured loss weights: sign conventions
            # (e.g. direct_lsq bias, reference losses.py:253-255) are
            # trace-time decisions and must not ride the traced loss_scale.
            static_loss_scale={k: float(v) for k, v in self.loss_cfg.items()},
        )
        tree = self.train_ds.kinematic_tree
        step_kwargs = dict(
            mcmi_bandwidth=float(self.dis_cfg.get("bandwidth") or 1.0),
            mcmi_var_mode=self.dis_cfg.get("var_mode") or "sphere",
            adv_fit=bool(self.dis_cfg.get("adv_fit", True)),
            adv_n_iter=int(self.dis_cfg.get("n_iter") or 5),
            batch_fn=(
                self.train_ds.make_batch_fn()
                if self.host_stream
                else self._batch_fn(self.train_ds)
            ),
            # None = PARAM_KEYS-filled "unset" (params/read.py) — default on
            donate=self.train_cfg.get("donate") is not False,
            **common,
        )
        self._tree = tree
        self._step_kwargs = step_kwargs
        self.train_step = make_train_step(self.model, self.tx, tree, **step_kwargs)
        # Device-resident batch loop (one dispatch per epoch); opt out with
        # train.scan_epoch: false to step batch-by-batch from the host.
        # PARAM_KEYS fill writes None for unset keys (params/read.py), which
        # must mean "default on" — only an explicit false opts out.
        _scan = self.train_cfg.get("scan_epoch")
        self.use_scan_epoch = True if _scan is None else bool(_scan)
        # Host streaming feeds slabs per step; the scanned TRAIN epoch needs
        # the full store device-resident (eval scanning is unaffected: the
        # val split stays device-resident).
        self.scan_train = self.use_scan_epoch and not self.host_stream
        self.train_epoch_fn = (
            make_train_epoch(self.model, self.tx, tree, **step_kwargs)
            if self.scan_train
            else None
        )
        self.eval_step = (
            make_eval_step(
                self.model, tree, batch_fn=self._batch_fn(self.val_ds), **common
            )
            if self.val_ds is not None
            else None
        )

        self._reinit_gr = None
        if self.model.gr_dims:
            def reinit(rng):
                return self.model.init(
                    {"params": rng, "dropout": rng}, dummy, rng=rng, train=True
                )["params"]

            self._reinit_gr = jax.jit(reinit)

        self.logger = MetricLogger(
            self.out_path,
            use_wandb=run is not None,
            wandb_run=run,
            resume=bool(self.config["model"].get("load_model"))
            and self.start_epoch > 0,
            start_epoch=self.start_epoch,
        )
        self.np_rng = np.random.default_rng(self.seed)

    # -- helpers ----------------------------------------------------------

    def make_grad_fn(self):
        """Jitted pre-optimizer view of the fused step (raw psum'd
        gradients + loss terms + detached mu) through the exact
        make_train_step loss path — used by the SPMD-contract tests to
        assert mesh-layout invariance at the production learning rate
        without Adam's sign-flip chaos (VERDICT r4 W3/#4)."""
        from scrubvae_tpu.train.step import make_grad_step

        return make_grad_step(self.model, self._tree, **self._step_kwargs)

    def _batch_fn(self, dataset):
        if dataset is None:
            return None
        return lambda idx: dataset.batch(idx)

    def _device_idx(self, idx):
        """Batch indices, sharded over the data axis when a mesh is active
        ((S, B) scan matrices shard the B dim; (B,) shards directly)."""
        idx = jnp.asarray(idx)
        if self.mesh is None:
            return idx
        from jax.sharding import NamedSharding, PartitionSpec as P

        from scrubvae_tpu.parallel import data_axis_size

        # Ragged eval-tail batches (len(val) % batch_size) need not divide
        # the mesh; run those replicated (correct, just not parallel).
        if idx.shape[-1] % data_axis_size(self.mesh):
            spec = P()
        elif idx.ndim == 2:
            spec = P(None, "data")
        else:
            spec = P("data")
        return jax.device_put(idx, NamedSharding(self.mesh, spec))

    def _maybe_restore(self):
        load_model = self.config["model"].get("load_model")
        if load_model and self.start_epoch:
            params, batch_stats = ckpt.load_weights(
                load_model,
                self.start_epoch,
                self.state.params,
                self.state.batch_stats,
            )
            self.state = self.state.replace(params=params)
            if batch_stats is not None:
                self.state = self.state.replace(batch_stats=batch_stats)
            full = ckpt.load_train_state(load_model, self.start_epoch, self.state)
            if full is not None:
                self.state = full

    def loss_scale_for_epoch(self, epoch: int) -> Dict[str, jnp.ndarray]:
        scale = {k: float(v) for k, v in self.loss_cfg.items()}
        if "prior" in scale and self.train_cfg.get("beta_anneal"):
            scale["prior"] = optim.cyclical_beta(
                epoch, beta_max=float(self.loss_cfg["prior"])
            )
        return {k: jnp.asarray(v, dtype=jnp.float32) for k, v in scale.items()}

    # -- epochs -----------------------------------------------------------

    def _param_dtype_lowp(self) -> bool:
        return (self.train_cfg.get("param_dtype") or "f32") == "bf16"

    def _maybe_lowp_params(self, params):
        """Opt-in bf16 storage for the large kernels (train.param_dtype:
        bf16): halves the weight-read traffic of the fwd/bwd matmuls and
        the optimizer pass on the bandwidth-bound flagship step. The
        fused optimizer keeps these integrating via stochastically-rounded
        weight stores (ops/fused_adamw.py); small leaves (biases, norm
        scales, PReLU slopes) stay f32. Requires model.precision bf16
        (compute already happens in bf16, so the forward is unchanged up
        to the storage rounding). Documented deviation - off by default."""
        if not self._param_dtype_lowp():
            return params
        threshold = optim.FusedAdamW.MIN_PALLAS_ELEMS

        def conv(p):
            if p.dtype == jnp.float32 and p.size >= threshold:
                return p.astype(jnp.bfloat16)
            return p

        return jax.tree.map(conv, params)

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        loss_scale = self.loss_scale_for_epoch(epoch)
        if self.scan_train:
            n = len(self.train_ds)
            steps = max(n // self.batch_size, 1)
            perm = self.np_rng.permutation(n)[: steps * self.batch_size]
            idx_matrix = self._device_idx(perm.reshape(steps, self.batch_size))
            self.state, metrics = self.train_epoch_fn(
                self.state, idx_matrix, loss_scale
            )
            return {k: float(v) for k, v in metrics.items()}
        sums: Dict[str, float] = {}
        count = 0
        for batch in self._step_batches():
            self.state, metrics = self.train_step(self.state, batch, loss_scale)
            count += 1
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + v
        return {k: float(v) / max(count, 1) for k, v in sums.items()}

    def _step_batches(self):
        """Per-step batch feed: window indices for device-resident data,
        prefetched device slabs for a host-streaming train split."""
        batches = epoch_batches(len(self.train_ds), self.batch_size, self.np_rng)
        if not self.host_stream:
            for idx in batches:
                yield self._device_idx(idx)
            return
        from scrubvae_tpu.data.hoststream import prefetch_to_device

        sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # capacity axis, not throughput: slabs replicate under a mesh
            sharding = NamedSharding(self.mesh, P())
        yield from prefetch_to_device(
            self.train_ds.epoch_slabs(batches), size=2, sharding=sharding
        )

    def _gen_restrict_keys(self):
        return tuple(
            k
            for k in self.info["disentangle_keys"]
            if k != "ids" and k in ("heading", "avg_speed_3d")
        )

    def _get_eval_epoch_fn(self):
        """Lazily-built scanned validation epoch (one dispatch)."""
        if getattr(self, "_eval_epoch_fn", None) is None:
            from scrubvae_tpu.train.step import make_eval_epoch

            common = dict(
                disentangle_config=self.dis_cfg,
                loss_keys=tuple(self.loss_cfg.keys()),
                disentangle_keys=tuple(self.info["disentangle_keys"]),
                conditional_keys=tuple(self.info["conditional_keys"]),
                feat_slices=self.feat_slices,
                adv_bundle=self.adv_bundle,
            )
            self._eval_epoch_fn = make_eval_epoch(
                self.model,
                self.val_ds.kinematic_tree,
                gen_restrict_keys=self._gen_restrict_keys(),
                norm_params=self.val_ds.norm_params,
                batch_fn=self._batch_fn(self.val_ds),
                **common,
            )
        return self._eval_epoch_fn

    def _get_eval_mi_fn(self):
        """Jitted builder of the eval-time MCMI estimator from a strided
        slice of the val split (reference test_epoch, trainer.py:228-252:
        ``loader.dataset[::int(len/batch_size)]`` encoded under the current
        params, y_s = concat of the conditional features)."""
        if getattr(self, "_eval_mi_fn", None) is None:
            batch_fn = self._batch_fn(self.val_ds)
            bandwidth = float(self.dis_cfg.get("bandwidth") or 1.0)
            var_mode = self.dis_cfg.get("var_mode") or "sphere"
            model = self.model

            def build(params, batch_stats, idx):
                from scrubvae_tpu.models.layers import packed_diag

                data = batch_fn(idx)
                variables = {"params": params}
                if batch_stats is not None:
                    variables["batch_stats"] = batch_stats
                enc = model.apply(
                    variables, data, train=False, method=model.encode
                )
                var = model.bind(variables).vae.build_conditionals(data)
                mu = jax.lax.stop_gradient(enc["mu"])
                return scr.mi_init(
                    mu,
                    var,
                    bandwidth=bandwidth,
                    var_mode=var_mode,
                    model_L=(
                        jax.lax.stop_gradient(enc["L"]) if "L" in enc else None
                    ),
                    model_diag=(
                        jax.lax.stop_gradient(
                            packed_diag(enc["Lp"], mu.shape[1])
                        )
                        if "Lp" in enc
                        else None
                    ),
                    valid=1.0,
                )

            self._eval_mi_fn = jax.jit(build)
        return self._eval_mi_fn

    def _refresh_eval_mi(self):
        """Rebuild ``mi_state`` from the strided val slice and write it back
        into the carried train state — the reference replaces
        ``model.mi_estimator`` in place, so the next train epoch's first
        batch also consumes the val-built estimator (trainer.py:228-252).

        Shape discipline (documented deviation, PARITY.md): the KDE sample
        buffer must keep the static ``(batch_size, ...)`` shape — it rides
        the lax.scan carry of the scanned train epoch — so exactly
        ``batch_size`` strided samples are taken (``(arange(B) * stride) %
        n``: the first B elements of the reference's ``ceil(n/stride)``-
        sample slice, wrapping only when ``len(val) < batch_size``)."""
        n = len(self.val_ds)
        stride = max(n // self.batch_size, 1)
        idx = (np.arange(self.batch_size) * stride) % n
        mi = self._get_eval_mi_fn()(
            self.state.params,
            self.state.batch_stats,
            self._device_idx(jnp.asarray(idx, dtype=jnp.int32)),
        )
        if self.mesh is not None and self.state.mi_state is not None:
            # keep the carried estimator's exact layout: a differently-
            # sharded mi_state would silently recompile the train epoch
            mi = jax.tree.map(
                lambda new, old: jax.device_put(new, old.sharding)
                if hasattr(old, "sharding")
                else new,
                mi,
                self.state.mi_state,
            )
        self.state = self.state.replace(mi_state=mi)

    def test_epoch(self, epoch: int):
        """Validation epoch over the FULL val split.

        Both paths (scanned and per-step) cover every sample exactly once:
        full batches plus a tail batch when ``len(val) % batch_size != 0``
        (the scanned path runs the tail through the per-step eval), with
        per-sample weighting of the batch means. No index wraparound, so the
        scanned and per-step metrics agree exactly on any split size.

        With MCMI active, the estimator is rebuilt from a strided val slice
        before the loop and carried back into the train state, both per the
        reference (trainer.py:228-252).
        """
        from scrubvae_tpu.evals.restrictiveness import generative_restrictiveness_batch

        if self.use_mcmi:
            self._refresh_eval_mi()
        loss_scale = self.loss_scale_for_epoch(epoch)
        rng = jax.random.PRNGKey(1000 + epoch)
        n = len(self.val_ds)
        B = self.batch_size
        steps = n // B

        sums: Dict[str, float] = {}
        count = 0
        zs = []
        gen_res = {k: {"pred": [], "target": []} for k in self._gen_restrict_keys()}

        def accumulate(bl: Dict[str, float], nb: int):
            nonlocal count
            for k, v in bl.items():
                sums[k] = sums.get(k, 0.0) + float(v) * nb
            count += nb

        if self.use_scan_epoch and steps > 0:
            idx_matrix = self._device_idx(np.arange(steps * B).reshape(steps, B))
            m, z, gen, rng = self._get_eval_epoch_fn()(
                self.state, idx_matrix, loss_scale, rng
            )
            accumulate({k: float(v) for k, v in m.items()}, steps * B)
            zs.append(np.asarray(z))
            for key, (pred, target) in gen.items():
                gen_res[key]["pred"].append(np.asarray(pred))
                gen_res[key]["target"].append(np.asarray(target))
            tail = [np.arange(steps * B, n)] if steps * B < n else []
        else:
            tail = list(epoch_batches(n, B, None, drop_last=False))

        for idx in tail:
            bl, mu = self.eval_step(self.state, self._device_idx(idx), loss_scale)
            zs.append(np.asarray(mu))
            accumulate(bl, len(idx))
            data = self.val_ds.batch(jnp.asarray(idx))
            for key in gen_res:
                rng, sub = jax.random.split(rng)
                pred, target = generative_restrictiveness_batch(
                    self.model,
                    {"params": self.state.params, "batch_stats": self.state.batch_stats},
                    mu,
                    data,
                    key,
                    self.val_ds.kinematic_tree,
                    sub,
                    norm_params=self.val_ds.norm_params,
                )
                gen_res[key]["pred"].append(np.asarray(pred))
                gen_res[key]["target"].append(np.asarray(target))

        metrics = {k: v / max(count, 1) for k, v in sums.items()}
        for key, d in gen_res.items():
            pred = np.concatenate(d["pred"], axis=0)
            target = np.concatenate(d["target"], axis=0)
            ss_res = ((target - pred) ** 2).sum()
            ss_tot = ((target - target.mean(axis=0)) ** 2).sum()
            metrics[f"r2_gen_restrict_{key}"] = float(1.0 - ss_res / ss_tot)
        return metrics, np.concatenate(zs, axis=0) if zs else np.zeros((0,))

    @staticmethod
    def _fold_summary(out: Dict[str, float], name: str, folds) -> None:
        """mean/std over valid folds; failed (nan) folds are counted in an
        explicit ``{name}_nanfolds`` metric instead of silently poisoning the
        mean (VERDICT r1 W2)."""
        folds = np.asarray(folds, dtype=float)
        n_nan = int(np.isnan(folds).sum())
        valid = folds[~np.isnan(folds)]
        out[f"{name}_mean"] = float(valid.mean()) if valid.size else float("nan")
        out[f"{name}_std"] = float(valid.std()) if valid.size else float("nan")
        if n_nan:
            out[f"{name}_nanfolds"] = float(n_nan)

    def decodability_metrics(self, z_val: np.ndarray) -> Dict[str, float]:
        from scrubvae_tpu.evals import metrics as em

        out = {}
        window = self.info["window"]
        dataset_name = self.config["data"].get("dataset")
        # classification folds downsample by window//stride (stride 10 on
        # every dataset but 4_mice - reference eval/metrics.py:160,204-211);
        # regression folds keep the full window
        class_window = em.decodability_class_window(dataset_name, window)
        if self.train_cfg.get("minimal_test"):
            return out
        if dataset_name == "parkinsons":
            keys = ["ids", "pd_label"]
            for key in keys:
                y = np.asarray(self.val_ds.batch(jnp.arange(len(self.val_ds)))[key])
                self._fold_summary(
                    out, f"acc_{key}_log",
                    em.log_class_rand_cv(z_val, y.astype(int), class_window, 5),
                )
                self._fold_summary(
                    out, f"acc_{key}_qda",
                    em.qda_rand_cv(z_val, y.astype(int), class_window, 5),
                )
        else:
            full = self.val_ds.batch(jnp.arange(len(self.val_ds)))
            for key in ("avg_speed_3d", "heading"):
                if key not in full:
                    continue
                y = np.asarray(full[key])
                self._fold_summary(
                    out, f"r2_{key}_lin", em.linear_rand_cv(z_val, y, window, 5)
                )
                self._fold_summary(
                    out, f"r2_{key}_mlp", em.mlp_rand_cv(z_val, y, window, 5)
                )
            y = np.asarray(full["ids"]).astype(int)
            self._fold_summary(
                out, "acc_ids_log", em.log_class_rand_cv(z_val, y, class_window, 5)
            )
            self._fold_summary(
                out, "acc_ids_qda", em.qda_rand_cv(z_val, y, class_window, 5)
            )
        return out

    def reset_gr(self, epoch: int):
        """Per-epoch re-init of the gradient-reversal ensembles (reference
        trainer.py:368-370)."""
        if self._reinit_gr is None:
            return
        fresh = self._reinit_gr(jax.random.PRNGKey(self.seed * 100003 + epoch))
        params = dict(self.state.params)
        for name in params:
            if name.startswith("gr_"):
                new = fresh[name]
                if self.mesh is not None:
                    from scrubvae_tpu.parallel import replicate

                    new = replicate(new, self.mesh)
                params[name] = new
        self.state = self.state.replace(params=params)

    def lambda_metrics(self) -> Dict[str, float]:
        out = {}
        ss = self.state.scrub_state
        if "moving_avg_lsq" in ss:
            for k, st in ss["moving_avg_lsq"].items():
                out[f"lambda_mals_{k}"] = float(st.lam1)
        if "qda" in ss:
            for k, st in ss["qda"].items():
                out[f"lambda_qda_{k}"] = float(np.asarray(st.lama).mean())
        return out

    def _check_finite(self, train_metrics: Dict[str, float], epoch: int):
        """Divergence tripwire: a non-finite epoch loss halts the run with a
        diagnostic checkpoint instead of silently training dead weights for
        the remaining epochs (the reference trains on, writing NaN rows,
        reference trainer.py:322-516). Opt out with
        ``train.halt_on_nonfinite: false`` (PARAM_KEYS None-fill: unset
        means default-on); the cost is one host float check per epoch."""
        flag = self.train_cfg.get("halt_on_nonfinite")
        if flag is False or np.isfinite(train_metrics.get("total", 0.0)):
            return
        bad = {k: v for k, v in train_metrics.items() if not np.isfinite(v)}
        path = ckpt.save_train_state(self.out_path, epoch, self.state)
        raise FloatingPointError(
            f"non-finite training loss at epoch {epoch}: {bad}; "
            f"diagnostic train state saved to {path} "
            "(set train.halt_on_nonfinite: false to train through)"
        )

    def fit(self, num_epochs: Optional[int] = None):
        num_epochs = num_epochs or int(self.train_cfg.get("num_epochs") or 1)
        for epoch in range(self.start_epoch + 1, num_epochs + 1):
            t0 = time.time()
            train_metrics = self.train_epoch(epoch)
            self._check_finite(train_metrics, epoch)
            metrics = {f"{k}_train": v for k, v in train_metrics.items()}
            self.reset_gr(epoch)
            metrics.update(self.lambda_metrics())
            metrics["time"] = time.time() - t0

            if epoch % 5 == 0:
                ckpt.save_weights(
                    self.out_path, epoch, self.state.params, self.state.batch_stats
                )
                if epoch % 20 == 0:
                    ckpt.save_train_state(self.out_path, epoch, self.state)
                if epoch >= self.eval_start_epoch and self.eval_step is not None:
                    test_metrics, z_val = self.test_epoch(epoch)
                    metrics.update({f"{k}_test": v for k, v in test_metrics.items()})
                    metrics.update(self.decodability_metrics(z_val))

            self.logger.log(metrics, epoch)
        return self.state


def train(config: dict, datasets=None, model=None, info=None, run=None):
    """Reference-parity entry: scrubvae.train.train(config, model, loaders).
    Builds datasets/model from config when not supplied."""
    if datasets is None or model is None:
        datasets, model, info = factory.data_and_model(
            config,
            train_val_test=("train", "val"),
            data_keys=tuple(
                ["x6d", "root", "offsets", "target_pose"]
                + list(config["disentangle"].get("features") or [])
            ),
        )
    trainer = Trainer(config, datasets, model, info, run=run)
    trainer.fit()
    return trainer
