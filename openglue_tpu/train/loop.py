"""Training loop (replaces pl.Trainer; reference train.py:69-85,
matching_module.py:71-131).

Structure per epoch: ``steps_per_epoch`` jitted train steps (reference
limit_train_batches=steps_per_epoch, train.py:77) -> validation sweep with the
epipolar / pose-AUC metrics -> checkpoint (every epoch, keep all). FAVOR
projections are redrawn every ``favor_redraw_interval`` steps (reference
utils/lightning_callbacks.py:10-14). Metrics/losses go to TensorBoard via
tensorboardX when a log_dir is given; host logging is rank-0 only.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Iterable, Optional, Sequence

import jax
import numpy as np

from openglue_tpu.core.types import PairBatch
from openglue_tpu.metrics import CameraPoseAUC, EpipolarDistanceMetric
from openglue_tpu.train.checkpoint import save_train_state
from openglue_tpu.train.state import MatcherTrainState
from openglue_tpu.train.step import redraw_favor_projections


@dataclasses.dataclass
class TrainLoopConfig:
    steps_per_epoch: int = 1000
    max_epochs: int = 10
    log_every_n_steps: int = 50
    favor_redraw_interval: Optional[int] = None  # steps; None = never
    checkpoint_dir: Optional[str] = None
    log_dir: Optional[str] = None
    # W&B adapter (reference utils/train_utils.py:54-60 dual-logs TB + W&B).
    # Import-gated: silently disabled when the wandb package is absent.
    wandb_enabled: bool = False
    wandb_project: str = "superglue"
    wandb_run_name: Optional[str] = None
    config_snapshot: Optional[dict] = None  # uploaded to the run config, rank 0
    eval_threshold: float = 5e-4
    pose_auc_thresholds: tuple = (5.0, 10.0, 20.0)
    ransac_thresh_px: float = 0.5
    seed: int = 0
    # learning-rate monitor (reference LearningRateMonitor,
    # utils/train_utils.py:41): the per-step schedule is deterministic, so
    # the loop logs lr_schedule(step) host-side — no device sync
    lr_schedule: Optional[Callable[[int], float]] = None
    # keep this many batches sharded/transferred AHEAD of the step being
    # dispatched: jax dispatch is async, so batch k+1's host->device transfer
    # (and the loader's next() behind it) rides under batch k's device
    # compute instead of serializing with it. 0 disables.
    device_prefetch: int = 2


def _is_main_host() -> bool:
    return jax.process_index() == 0


class MetricsLogger:
    """TB + optional W&B dual logger (reference utils/train_utils.py:54-60),
    rank-0 only. W&B mirrors the reference's ``WandbLogger(project="superglue")``
    with the config uploaded from rank 0; the import is gated so environments
    without the wandb package (like this one) silently fall back to TB-only."""

    def __init__(
        self,
        log_dir: Optional[str],
        wandb_enabled: bool = False,
        wandb_project: str = "superglue",
        wandb_run_name: Optional[str] = None,
        config_snapshot: Optional[dict] = None,
    ):
        self.writer = None
        self.wandb_run = None
        if not _is_main_host():
            return
        if log_dir:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(log_dir)
            except ImportError:
                pass
        if wandb_enabled:
            try:
                import wandb

                self.wandb_run = wandb.init(
                    project=wandb_project,
                    name=wandb_run_name,
                    config=config_snapshot or {},
                )
            except Exception:  # package absent, offline, or auth failure
                self.wandb_run = None

    @classmethod
    def from_config(cls, config: "TrainLoopConfig") -> "MetricsLogger":
        return cls(
            config.log_dir,
            wandb_enabled=config.wandb_enabled,
            wandb_project=config.wandb_project,
            wandb_run_name=config.wandb_run_name,
            config_snapshot=config.config_snapshot,
        )

    def log(self, tag_values: Dict[str, float], step: int) -> None:
        if self.writer:
            for tag, value in tag_values.items():
                self.writer.add_scalar(tag, value, step)
        if self.wandb_run:
            self.wandb_run.log(dict(tag_values), step=step)

    def close(self) -> None:
        if self.writer:
            self.writer.close()
        if self.wandb_run:
            self.wandb_run.finish()


def _shard_eval_batch(batch, shard_fn: Optional[Callable]):
    """Place an eval batch on the mesh, tolerating partial tail batches.

    Validation keeps the trailing partial batch (metrics must see every
    pair), but a tail smaller than the mesh's data axis cannot be sharded
    over it — fall back to letting the (plain-jit) eval step place it
    unsharded rather than dropping the pairs or crashing the sweep."""
    if shard_fn is None:
        return batch
    try:
        return shard_fn(batch)
    except ValueError:
        return batch


def evaluate(
    state: MatcherTrainState,
    eval_step: Callable,
    eval_batches: Iterable[PairBatch],
    config: TrainLoopConfig,
    shard_fn: Optional[Callable] = None,
) -> Dict[str, float]:
    """Validation sweep (reference validation_step, matching_module.py:107-131):
    device-side match decode + epipolar counting, host-side RANSAC pose AUC."""
    epipolar = EpipolarDistanceMetric(config.eval_threshold)
    pose_auc = CameraPoseAUC(config.pose_auc_thresholds, config.ransac_thresh_px)
    for batch in eval_batches:
        batch = _shard_eval_batch(batch, shard_fn)
        out = eval_step(state, batch)
        tf = batch.transformation
        kpts0 = np.asarray(batch.side0.keypoints)
        kpts1 = np.asarray(batch.side1.keypoints)
        matches0 = np.asarray(out["matches0"])
        detected = np.asarray(batch.side0.mask).sum(axis=1)
        epipolar.update(
            kpts0, kpts1, matches0, tf.K0, tf.K1, tf.R, tf.T, num_detected=detected
        )
        pose_auc.update(kpts0, kpts1, matches0, tf.K0, tf.K1, tf.R, tf.T)
    epipolar.sync()
    pose_auc.sync()
    return {**epipolar.compute(), **pose_auc.compute()}


def evaluate_online(
    state: MatcherTrainState,
    eval_step: Callable,
    eval_batches: Iterable,
    config: TrainLoopConfig,
    shard_fn: Optional[Callable] = None,
) -> Dict[str, float]:
    """Validation for the ONLINE path (image batches; keypoints come from the
    eval step's extraction). Pose metrics require a 3d_reprojection
    transformation with K/R/T."""
    from openglue_tpu.metrics import HomographyPrecisionMetric

    epipolar = EpipolarDistanceMetric(config.eval_threshold)
    pose_auc = CameraPoseAUC(config.pose_auc_thresholds, config.ransac_thresh_px)
    homography = HomographyPrecisionMetric()
    for batch in eval_batches:
        batch = _shard_eval_batch(batch, shard_fn)
        out = eval_step(state, batch)
        tf = batch["transformation"]
        kpts0 = np.asarray(out["keypoints0"])
        kpts1 = np.asarray(out["keypoints1"])
        matches0 = np.asarray(out["matches0"])
        detected = np.asarray(out["mask0"]).sum(axis=1)
        if getattr(tf, "kind", None) == "3d_reprojection":
            epipolar.update(
                kpts0, kpts1, matches0, tf.K0, tf.K1, tf.R, tf.T, num_detected=detected
            )
            pose_auc.update(kpts0, kpts1, matches0, tf.K0, tf.K1, tf.R, tf.T)
        elif getattr(tf, "kind", None) == "perspective":
            homography.update(kpts0, kpts1, matches0, tf.H, num_detected=detected)
    epipolar.sync()
    pose_auc.sync()
    homography.sync()
    metrics: Dict[str, float] = {}
    if epipolar.precisions:
        metrics.update({**epipolar.compute(), **pose_auc.compute()})
    if homography.precisions:
        metrics.update(homography.compute())
    return metrics


def prefetch_to_device(
    batches: Iterable, shard_fn: Callable, depth: int = 2
) -> Iterable:
    """Yield device-placed batches, keeping up to ``depth`` placed AHEAD of
    the consumer. After a batch is yielded (and its step dispatched — async),
    the generator resumes and shards the NEXT batch, so the host loader +
    H2D transfer overlap the in-flight device step instead of serializing
    with it (VERDICT round-4 #1c)."""
    import collections

    buf = collections.deque()
    it = iter(batches)

    def fill():
        while len(buf) < depth:
            try:
                buf.append(shard_fn(next(it)))
            except StopIteration:
                return False
        return True

    fill()
    while buf:
        yield buf.popleft()
        fill()


def precompile_buckets(
    step_fn: Callable,
    state: MatcherTrainState,
    example_batch,
    bucket_sizes: Sequence[int],
    shard_fn: Optional[Callable] = None,
) -> None:
    """Up-front compile warmup for bucketed training (VERDICT round-4 #7a;
    serving counterpart: cli/inference.py precompile): execute the step once
    per bucket shape on a dummy derived from a real batch, discarding the
    outputs. Without this, each bucket's FIRST appearance mid-epoch pays its
    own program compile — multi-minute silences that look exactly like the
    hangs this environment is prone to (BASELINE.md round-4 trainer proof).

    jit compilation blocks the host at dispatch, so the printed per-bucket
    wall time IS the compile time; the dummy step's execution is async and
    deliberately never fetched (a fetch would add a tunnel sync)."""
    from openglue_tpu.data.collate import resize_keypoint_axis

    for n in sorted({int(b) for b in bucket_sizes}):
        t0 = time.time()
        dummy = resize_keypoint_axis(example_batch, n)
        if shard_fn is not None:
            dummy = shard_fn(dummy)
        try:
            step_fn(state, dummy)  # outputs discarded; state is not advanced
        except jax.errors.JaxRuntimeError as exc:
            # transient remote-compile RPC drops happen on tunneled TPU
            # backends; one retry before giving up (persistent failures
            # re-raise with the original cause)
            if _is_main_host():
                print(f"precompile N={n} failed ({exc}); retrying once", flush=True)
            step_fn(state, dummy)
        if _is_main_host():
            print(
                f"precompiled bucket N={n} in {time.time() - t0:.1f}s",
                flush=True,
            )


def fit(
    state: MatcherTrainState,
    train_step: Callable,
    train_batches: Iterable,
    config: TrainLoopConfig,
    eval_step: Optional[Callable] = None,
    eval_batches_fn: Optional[Callable[[], Iterable]] = None,
    shard_fn: Optional[Callable] = None,
    step_takes_rng: bool = False,
    evaluate_fn: Callable = None,
) -> MatcherTrainState:
    """Drive training. train_batches yields host batches (infinite ok);
    shard_fn places them on the mesh. Returns the final state."""
    logger = MetricsLogger.from_config(config)
    rng = jax.random.key(config.seed)
    train_iter = iter(train_batches)
    if shard_fn is not None and config.device_prefetch > 0:
        # loader next() + H2D of batch k+1 overlap the (async-dispatched)
        # device step k
        train_iter = iter(prefetch_to_device(train_iter, shard_fn, config.device_prefetch))
        get_batch = lambda: next(train_iter)
    elif shard_fn is not None:
        get_batch = lambda: shard_fn(next(train_iter))
    else:
        get_batch = lambda: next(train_iter)
    # host-side step counter: reading state.step every step would force a
    # host-device sync on the hot path and kill async dispatch
    step_idx = int(state.step)

    for epoch in range(config.max_epochs):
        t_epoch = time.time()
        for _ in range(config.steps_per_epoch):
            if (
                config.favor_redraw_interval
                and step_idx > 0
                and step_idx % config.favor_redraw_interval == 0
            ):
                state = redraw_favor_projections(state, rng)
            batch = get_batch()
            if step_takes_rng:
                state, metrics = train_step(state, batch, rng)
            else:
                state, metrics = train_step(state, batch)
            if step_idx % config.log_every_n_steps == 0:
                host_metrics = {k: float(v) for k, v in metrics.items()}
                if config.lr_schedule is not None:
                    host_metrics["lr"] = float(config.lr_schedule(step_idx))
                logger.log({f"train/{k}": v for k, v in host_metrics.items()}, step_idx)
                if _is_main_host():
                    print(
                        f"epoch {epoch} step {step_idx}: "
                        + " ".join(f"{k}={v:.4f}" for k, v in host_metrics.items()),
                        flush=True,
                    )
            step_idx += 1

        if eval_step is not None and eval_batches_fn is not None:
            run_eval = evaluate_fn or evaluate
            eval_metrics = run_eval(state, eval_step, eval_batches_fn(), config, shard_fn)
            logger.log({f"val/{k}": v for k, v in eval_metrics.items()}, int(state.step))
            if _is_main_host():
                print(
                    f"epoch {epoch} val: "
                    + " ".join(f"{k}={v:.4f}" for k, v in eval_metrics.items()),
                    flush=True,
                )

        if config.checkpoint_dir:
            # collective: orbax save/wait barrier across ALL hosts — gating on
            # process 0 would deadlock multi-host runs
            save_train_state(config.checkpoint_dir, state)
        if _is_main_host():
            print(f"epoch {epoch} done in {time.time() - t_epoch:.1f}s", flush=True)

    logger.close()
    return state
