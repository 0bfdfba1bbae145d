"""Fine-tuning trainer: optax optimizers/schedules, checkpoints, resume.

Counterpart of ``/root/reference/chgnet/trainer/trainer.py:40-716`` on the
jitted padded-batch pipeline:

* optimizers SGD / Adam / AdamW / RAdam (optax), with the composition
  AtomRef frozen via ``optax.masked`` unless ``train_composition_model``
  (reference freezes by requires_grad, ``trainer.py:298-300``),
* schedulers MultiStepLR / ExponentialLR / CosineAnnealingLR (T_max =
  10 * epochs) / CosRestartLR, stepped 10x per epoch exactly like the
  reference (``trainer.py:165-205,413-415``) through
  ``optax.inject_hyperparams``,
* criterion MSE / MAE / Huber(delta=0.1), targets "ef"/"efs"/"efsm",
  NaN-loss early exit, per-epoch checkpoint rotation with ``bestE_`` /
  ``bestF_`` copies and full resume (``trainer.py:625-688``),
* optional wandb logging per batch or per epoch (``trainer.py:232-251``).

The train step itself is ONE jitted function (forward + grad-of-grad
through forces + optimizer update) instead of eager backward calls.
"""

from __future__ import annotations

import datetime
import inspect
import math
import os
import pickle
import random
import shutil
import time
from typing import Literal

import jax
import numpy as np
import optax

from chgnet_tpu import TrainTask
from chgnet_tpu.trainer.losses import CombinedLoss, loss_and_metrics
from chgnet_tpu.utils.common import AverageMeter, write_json

try:
    import wandb
except ImportError:
    wandb = None

LogFreq = Literal["epoch", "batch"]


def _make_schedule(
    scheduler: str, learning_rate: float, epochs: int, params: dict
):
    """scheduler-step -> lr, mirroring the reference torch schedulers
    stepped 10 times per epoch (``trainer.py:165-205``)."""
    decay_fraction = params.pop("decay_fraction", 1e-2)
    if scheduler in {"MultiStepLR", "multistep"}:
        milestones = params.pop(
            "milestones", [4 * epochs, 6 * epochs, 8 * epochs, 9 * epochs]
        )
        gamma = params.pop("gamma", 0.3)

        def lr_at(step: int) -> float:
            return learning_rate * gamma ** sum(
                step >= m for m in milestones
            )

    elif scheduler in {"ExponentialLR", "Exp", "Exponential", "exp"}:
        gamma = params.pop("gamma", 0.98)

        def lr_at(step: int) -> float:
            return learning_rate * gamma**step

    elif scheduler in {"CosineAnnealingLR", "CosLR", "Cos", "cos"}:
        t_max = 10 * epochs
        eta_min = decay_fraction * learning_rate

        def lr_at(step: int) -> float:
            return eta_min + (learning_rate - eta_min) * 0.5 * (
                1 + math.cos(math.pi * step / t_max)
            )

    elif scheduler in {"CosRestartLR", "cosrestart"}:
        t_0 = params.pop("T_0", 10)
        t_mult = params.pop("T_mult", 2)
        eta_min = decay_fraction * learning_rate

        def lr_at(step: int) -> float:
            t_cur, t_i = step, t_0
            while t_cur >= t_i:
                t_cur -= t_i
                t_i *= t_mult
            return eta_min + (learning_rate - eta_min) * 0.5 * (
                1 + math.cos(math.pi * t_cur / t_i)
            )

    else:
        raise NotImplementedError(f"scheduler {scheduler!r}")
    return lr_at


class Trainer:
    """Train CHGNet-TPU with energy / force / stress / magmom targets."""

    def __init__(
        self,
        model=None,
        *,
        targets: TrainTask = "ef",
        energy_loss_ratio: float = 1,
        force_loss_ratio: float = 1,
        stress_loss_ratio: float = 0.1,
        mag_loss_ratio: float = 0.1,
        allow_missing_labels: bool = True,
        optimizer: str = "Adam",
        scheduler: str = "CosLR",
        criterion: str = "MSE",
        epochs: int = 50,
        starting_epoch: int = 0,
        learning_rate: float = 1e-3,
        print_freq: int = 100,
        torch_seed: int | None = None,
        data_seed: int | None = None,
        use_device: str | None = None,
        check_cuda_mem: bool = False,
        wandb_path: str | None = None,
        wandb_init_kwargs: dict | None = None,
        extra_run_config: dict | None = None,
        mesh=None,
        **kwargs,
    ) -> None:
        self.trainer_args = {
            k: v
            for k, v in locals().items()
            if k not in {"self", "__class__", "model", "kwargs", "mesh"}
        } | kwargs
        # data parallelism over a device mesh (a NEW capability vs the
        # single-device reference, SURVEY §2.6): int -> first-N-devices mesh
        if isinstance(mesh, int):
            from chgnet_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(mesh)
        self.mesh = mesh
        self.model = model
        self.targets = targets
        if data_seed is not None:
            random.seed(data_seed)
            np.random.seed(data_seed)

        self.optimizer_name = optimizer
        self.learning_rate = learning_rate
        if optimizer == "SGD":
            momentum = kwargs.pop("momentum", 0.9)
            weight_decay = kwargs.pop("weight_decay", 0.0)
            base = lambda lr: optax.chain(  # noqa: E731
                optax.add_decayed_weights(weight_decay)
                if weight_decay
                else optax.identity(),
                optax.sgd(lr, momentum=momentum),
            )
        elif optimizer == "Adam":
            weight_decay = kwargs.pop("weight_decay", 0.0)
            base = lambda lr: optax.chain(  # noqa: E731
                optax.add_decayed_weights(weight_decay)
                if weight_decay
                else optax.identity(),
                optax.adam(lr),
            )
        elif optimizer == "AdamW":
            weight_decay = kwargs.pop("weight_decay", 1e-2)
            base = lambda lr: optax.adamw(lr, weight_decay=weight_decay)  # noqa: E731
        elif optimizer == "RAdam":
            weight_decay = kwargs.pop("weight_decay", 0.0)
            base = lambda lr: optax.chain(  # noqa: E731
                optax.add_decayed_weights(weight_decay)
                if weight_decay
                else optax.identity(),
                optax.radam(lr),
            )
        else:
            raise NotImplementedError(f"optimizer {optimizer!r}")
        self._optimizer_factory = base

        scheduler_params = kwargs.pop("scheduler_params", {})
        self.scheduler_type = scheduler
        self._lr_at = _make_schedule(
            scheduler, learning_rate, epochs, dict(scheduler_params)
        )
        self.scheduler_step = 0
        self._global_step = 0  # drives the per-step dropout rng fold-in

        self.criterion = CombinedLoss(
            target_str=self.targets,
            criterion=criterion,
            energy_loss_ratio=energy_loss_ratio,
            force_loss_ratio=force_loss_ratio,
            stress_loss_ratio=stress_loss_ratio,
            mag_loss_ratio=mag_loss_ratio,
            allow_missing_labels=allow_missing_labels,
            **{k: kwargs[k] for k in ("delta",) if k in kwargs},
        )
        self.epochs = epochs
        self.starting_epoch = starting_epoch
        self.print_freq = print_freq
        self.training_history: dict[str, dict[str, list | float]] = {
            key: {"train": [], "val": [], "test": []} for key in self.targets
        }
        self.best_model_params = None
        self.opt_state = None
        self._jit_cache: dict = {}
        self._optimizer = self._build_optimizer(
            self.trainer_args.get("train_composition_model", False)
        )

        if wandb_path:
            if wandb is None:
                raise ImportError(
                    "Weights and Biases not installed. pip install wandb to "
                    "use wandb logging."
                )
            if wandb_path.count("/") == 1:
                project, run_name = wandb_path.split("/")
            else:
                raise ValueError(
                    f"{wandb_path=} should be in the format "
                    "'project/run_name' (no extra slashes)"
                )
            wandb.init(
                project=project,
                name=run_name,
                config=self.trainer_args | (extra_run_config or {}),
                **(wandb_init_kwargs or {}),
            )

    # ------------------------------------------------------------ optimizer
    def _build_optimizer(self, train_composition_model: bool):
        """lr-injectable optax transformation over the model's param
        pytree; the composition AtomRef stays frozen (zero updates) unless
        requested (``trainer.py:298-300``)."""

        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "frozen"
                if (
                    not train_composition_model
                    and path
                    and getattr(path[0], "key", None) == "composition"
                )
                else "trainable",
                params,
            )

        factory = self._optimizer_factory

        @optax.inject_hyperparams
        def make(learning_rate):
            return optax.multi_transform(
                {
                    "trainable": factory(learning_rate),
                    "frozen": optax.set_to_zero(),
                },
                label_fn,
            )

        return make(learning_rate=self._lr_at(self.scheduler_step))

    def _steps(self, train_composition_model: bool):
        """(train_step, eval_step) jitted closures, cached per flag."""
        key = bool(train_composition_model)
        if key in self._jit_cache:
            return self._jit_cache[key]
        config = self.model.config
        loss_fn = self.criterion
        optimizer = self._optimizer
        use_dropout = (
            float(config.conv_dropout) > 0 or float(config.mlp_dropout) > 0
        )

        @jax.jit
        def train_step(params, opt_state, batch, targets, step):
            rng = (
                jax.random.fold_in(jax.random.key(0), step)
                if use_dropout
                else None
            )
            grads, metrics = jax.grad(
                lambda p: loss_and_metrics(
                    p, batch, targets, config=config, loss_fn=loss_fn,
                    dropout_rng=rng,
                ),
                has_aux=True,
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        @jax.jit
        def eval_step(params, batch, targets):
            _, metrics = loss_and_metrics(
                params, batch, targets, config=config, loss_fn=loss_fn
            )
            return metrics

        self._jit_cache[key] = (train_step, eval_step)
        return self._jit_cache[key]

    # ----------------------------------------------------------------- train
    def train(
        self,
        train_loader,
        val_loader,
        test_loader=None,
        *,
        save_dir: str | None = "auto",
        save_test_result: bool = False,
        train_composition_model: bool = False,
        wandb_log_freq: LogFreq = "batch",
    ) -> None:
        """Train over padded-batch loaders (same contract as the reference
        ``train``, ``trainer.py:253-357``). ``save_dir`` defaults to a
        UTC-date directory as in the reference; pass ``None`` to disable
        checkpoint writing entirely."""
        if self.model is None:
            raise ValueError("Model needs to be initialized")
        if save_dir == "auto":
            save_dir = f"{datetime.datetime.now(tz=datetime.timezone.utc):%m-%d-%Y}"

        print(f"Begin Training: using {jax.devices()[0].platform} device")
        print(f"training targets: {self.targets}")
        self.trainer_args["train_composition_model"] = train_composition_model
        self._optimizer = self._build_optimizer(train_composition_model)
        self._jit_cache.clear()
        if self.opt_state is None:
            self.opt_state = self._optimizer.init(self.model.params)

        for epoch in range(self.starting_epoch, self.epochs):
            train_mae = self._train(train_loader, epoch, wandb_log_freq)
            if "e" in train_mae and train_mae["e"] != train_mae["e"]:
                print("Exit due to NaN")
                break
            val_mae = self._validate(
                val_loader, is_test=False, wandb_log_freq=wandb_log_freq
            )
            for key in self.targets:
                self.training_history[key]["train"].append(train_mae[key])
                self.training_history[key]["val"].append(val_mae[key])
            if "e" in val_mae and val_mae["e"] != val_mae["e"]:
                print("Exit due to NaN")
                break
            if "e" in val_mae and val_mae["e"] == min(
                self.training_history["e"]["val"]
            ):
                # snapshot params (the live model keeps training; an alias
                # would silently return the latest weights instead)
                self.best_model_params = jax.tree.map(
                    np.asarray, self.model.params
                )
            if save_dir:
                self.save_checkpoint(epoch, val_mae, save_dir=save_dir)
            if (
                wandb is not None
                and wandb_log_freq == "epoch"
                and self.trainer_args.get("wandb_path")
            ):
                wandb.log(
                    {f"train_{k}_mae": v for k, v in train_mae.items()}
                    | {f"val_{k}_mae": v for k, v in val_mae.items()}
                    | {"epoch": epoch}
                )

        if test_loader is not None:
            print("---------Evaluate Model on Test Set---------------")
            best_file = None
            for file in os.listdir(save_dir) if save_dir else ():
                if file.startswith("bestE_"):
                    best_file = os.path.join(save_dir, file)
            if best_file is not None:
                with open(best_file, "rb") as fh:
                    state = pickle.load(fh)
                self.model.params = state["model"]["params"]
            test_mae = self._validate(
                test_loader,
                is_test=True,
                test_result_save_path=save_dir if save_test_result else None,
            )
            for key in self.targets:
                self.training_history[key]["test"] = test_mae[key]
            if best_file is not None:
                self.save(filename=best_file)
            if wandb is not None and self.trainer_args.get("wandb_path"):
                wandb.log({f"test_{k}_mae": v for k, v in test_mae.items()})

    def _dp_step(self):
        """Jitted data-parallel train step over ``self.mesh`` (cached)."""
        if "dp" not in self._jit_cache:
            from chgnet_tpu.parallel.dp import make_dp_train_step

            self._jit_cache["dp"] = make_dp_train_step(
                config=self.model.config,
                loss_fn=self.criterion,
                optimizer=self._optimizer,
                mesh=self.mesh,
            )
        return self._jit_cache["dp"]

    def _iter_train_batches(self, train_loader):
        """Yield (batch, targets) ready for the train step; under a mesh,
        groups of D loader batches are stacked on a device axis (the
        trailing incomplete group is dropped)."""
        if self.mesh is None:
            yield from train_loader
            return
        from chgnet_tpu.parallel.dp import stack_batches, stack_targets

        n_dev = self.mesh.devices.size
        train_loader.ensure_fixed_capacities()
        group: list = []
        for item in train_loader:
            group.append(item)
            if len(group) == n_dev:
                yield (
                    stack_batches([b for b, _ in group]),
                    stack_targets([t for _, t in group]),
                )
                group = []

    def _train(
        self,
        train_loader,
        current_epoch: int,
        wandb_log_freq: LogFreq = "batch",
    ) -> dict:
        """One training epoch; lr stepped at each 1/10 of the epoch."""
        batch_time, data_time = AverageMeter(), AverageMeter()
        losses = AverageMeter()
        mae_errors = {t: AverageMeter() for t in self.targets}
        if self.mesh is not None:
            train_step = self._dp_step()
            n_batches = len(train_loader) // self.mesh.devices.size
        else:
            train_step, _ = self._steps(
                self.trainer_args.get("train_composition_model", False)
            )
            n_batches = len(train_loader)
        lr_marks = set(np.arange(1, 11) * n_batches // 10)

        start = time.perf_counter()
        for idx, (batch, targets) in enumerate(
            self._iter_train_batches(train_loader)
        ):
            data_time.update(time.perf_counter() - start)
            params, self.opt_state, metrics = train_step(
                self.model.params, self.opt_state, batch, targets,
                np.int32(self._global_step),
            )
            self._global_step += 1
            self.model.params = params
            loss = float(metrics["loss"])
            losses.update(loss, int(np.sum(targets["graph_mask"])))
            for key in self.targets:
                mae_errors[key].update(
                    float(metrics[f"{key}_MAE"]),
                    int(metrics[f"{key}_MAE_size"]),
                )
            if idx + 1 in lr_marks:
                self.scheduler_step += 1
                self.opt_state.hyperparams["learning_rate"] = np.float32(
                    self._lr_at(self.scheduler_step)
                )
            batch_time.update(time.perf_counter() - start)
            start = time.perf_counter()

            if idx == 0 or (idx + 1) % self.print_freq == 0:
                message = (
                    f"Epoch: [{current_epoch}][{idx + 1}/{n_batches}] | "
                    f"Time ({batch_time.avg:.3f})({data_time.avg:.3f}) | "
                    f"Loss {losses.val:.4f}({losses.avg:.4f}) | MAE "
                )
                for key in self.targets:
                    message += (
                        f"{key} {mae_errors[key].val:.3f}"
                        f"({mae_errors[key].avg:.3f})  "
                    )
                print(message)
            if (
                wandb is not None
                and wandb_log_freq == "batch"
                and self.trainer_args.get("wandb_path")
            ):
                wandb.log(
                    {f"train_{k}_mae": v.avg for k, v in mae_errors.items()}
                    | {
                        "train_loss": losses.avg,
                        "epoch": current_epoch,
                        "batch": idx,
                    }
                )
        return {key: round(err.avg, 6) for key, err in mae_errors.items()}

    def _validate(
        self,
        val_loader,
        *,
        is_test: bool = False,
        test_result_save_path: str | None = None,
        wandb_log_freq: LogFreq = "batch",
    ) -> dict:
        """Validation / test pass (``trainer.py:450-592``)."""
        losses = AverageMeter()
        mae_errors = {t: AverageMeter() for t in self.targets}
        _, eval_step = self._steps(
            self.trainer_args.get("train_composition_model", False)
        )
        test_pred: list = []

        for ii, (batch, targets) in enumerate(val_loader):
            metrics = eval_step(self.model.params, batch, targets)
            losses.update(
                float(metrics["loss"]), int(np.sum(targets["graph_mask"]))
            )
            for key in self.targets:
                mae_errors[key].update(
                    float(metrics[f"{key}_MAE"]),
                    int(metrics[f"{key}_MAE_size"]),
                )
            if is_test and test_result_save_path:
                test_pred.append(
                    {"batch": ii, "loss": float(metrics["loss"])}
                )
            if (
                wandb is not None
                and not is_test
                and wandb_log_freq == "batch"
                and self.trainer_args.get("wandb_path")
            ):
                wandb.log(
                    {f"val_{k}_mae": v.avg for k, v in mae_errors.items()}
                    | {"val_loss": losses.avg, "batch": ii}
                )

        if is_test:
            message = "**  "
            if test_result_save_path:
                write_json(
                    test_pred,
                    os.path.join(test_result_save_path, "test_result.json"),
                )
        else:
            message = "*   "
        for key in self.targets:
            message += f"{key}_MAE ({mae_errors[key].avg:.3f}) \t"
        print(message)
        if (
            wandb is not None
            and not is_test
            and wandb_log_freq == "epoch"
            and self.trainer_args.get("wandb_path")
        ):
            wandb.log({f"val_{k}_mae": v.avg for k, v in mae_errors.items()})
        return {k: round(v.avg, 6) for k, v in mae_errors.items()}

    # ------------------------------------------------------------ persistence
    def get_best_model(self):
        """Model with the lowest validation energy error (a fresh CHGNet
        carrying the snapshotted best-epoch parameters)."""
        if self.best_model_params is None:
            raise RuntimeError("the model needs to be trained first")
        mae = min(self.training_history["e"]["val"])
        print(f"Best model has val {mae =:.4}")
        from chgnet_tpu.models.chgnet import CHGNet

        return CHGNet(
            params=self.best_model_params, **self.model.config.as_dict()
        )

    @property
    def _init_keys(self) -> list[str]:
        return [
            key
            for key in list(inspect.signature(Trainer.__init__).parameters)
            if key not in {"self", "model", "kwargs"}
        ]

    def save(self, filename: str = "training_result.chkpt.pkl") -> None:
        """Pickle model params/config + optimizer/scheduler state +
        history (the analog of ``trainer.py:614-623``)."""
        state = {
            "model": {
                "params": jax.tree.map(np.asarray, self.model.params),
                "model_args": self.model.config.as_dict(),
            },
            "opt_state": jax.tree.map(np.asarray, self.opt_state)
            if self.opt_state is not None
            else None,
            "scheduler_step": self.scheduler_step,
            "training_history": self.training_history,
            "trainer_args": self.trainer_args,
        }
        with open(filename, "wb") as file:
            pickle.dump(state, file)

    def save_checkpoint(
        self, epoch: int, mae_error: dict, save_dir: str
    ) -> None:
        """Per-epoch rotation + bestE_/bestF_ copies (``trainer.py:625-665``)."""
        os.makedirs(save_dir, exist_ok=True)
        for fname in os.listdir(save_dir):
            if fname.startswith("epoch"):
                os.remove(os.path.join(save_dir, fname))
        err_str = "_".join(
            f"{key}{f'{mae_error[key] * 1000:.0f}' if key in mae_error else 'NA'}"
            for key in "efsm"
        )
        filename = os.path.join(
            save_dir, f"epoch{epoch}_{err_str}.chkpt.pkl"
        )
        self.save(filename=filename)

        if mae_error["e"] == min(self.training_history["e"]["val"]):
            for fname in os.listdir(save_dir):
                if fname.startswith("bestE"):
                    os.remove(os.path.join(save_dir, fname))
            shutil.copyfile(
                filename,
                os.path.join(
                    save_dir, f"bestE_epoch{epoch}_{err_str}.chkpt.pkl"
                ),
            )
        if "f" in self.targets and mae_error["f"] == min(
            self.training_history["f"]["val"]
        ):
            for fname in os.listdir(save_dir):
                if fname.startswith("bestF"):
                    os.remove(os.path.join(save_dir, fname))
            shutil.copyfile(
                filename,
                os.path.join(
                    save_dir, f"bestF_epoch{epoch}_{err_str}.chkpt.pkl"
                ),
            )

    @classmethod
    def load(cls, path: str) -> Trainer:
        """Restore a full trainer (model + optimizer + scheduler +
        history); ``starting_epoch`` resumes from history length
        (``trainer.py:667-688``)."""
        from chgnet_tpu.models.chgnet import CHGNet

        with open(path, "rb") as file:
            state = pickle.load(file)
        model = CHGNet.from_dict(state["model"])
        print(f"Loaded model params = {model.n_params:,}")
        state["trainer_args"].pop("model", None)
        trainer = cls(model=model, **state["trainer_args"])
        trainer.training_history = state["training_history"]
        trainer.scheduler_step = state["scheduler_step"]
        trainer.starting_epoch = len(trainer.training_history["e"]["train"])
        trainer._optimizer = trainer._build_optimizer(
            trainer.trainer_args.get("train_composition_model", False)
        )
        if state["opt_state"] is not None:
            # restore leaves into a freshly-built opt_state skeleton
            skeleton = trainer._optimizer.init(model.params)
            leaves = jax.tree_util.tree_leaves(state["opt_state"])
            treedef = jax.tree_util.tree_structure(skeleton)
            trainer.opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
        return trainer
