"""ESPNet training loop (ref ``module/espnet/train/main.py``).

Reproduces the reference's training recipe natively in JAX/optax:

- pickle-cached dataset statistics and ``1/ln(1.10+p)`` class weights
  (``main.py:203-211``, loadData)
- encoder vs decoder model with savedir suffix ``_enc_p_q`` / ``_dec_p_q``
  (``main.py:217-222``)
- five multi-scale train pipelines + val pipeline with the reference's
  exact sizes, crop sizes and batch-size offsets (``main.py:270-353``)
- Adam(lr=5e-4, betas=(0.9, 0.999), eps=1e-8) with torch-style (coupled)
  weight decay — ``--weight_decay``, reference default 5e-4
  (``main.py:382``) — and StepLR(step=step_loss, gamma=0.5)
  (``main.py:383-384``)
- per epoch: train on scale1, scale2, scale4, scale3, main — in that order
  (``main.py:396-406``) — then validate; biased per-batch-mean metrics in
  the logs, matching ``getMetric`` (``IOUEval.py:55-61``)
- artifacts: ``checkpoint.pth.tar``, ``model_{epoch}.pth`` (torch-format
  via the legacy writer, loadable by the reference), ``acc_{epoch}.txt``,
  ``trainValLog.txt``, ``mean_std.txt`` (``main.py:263-266,373-443``)

TPU-native: with ``--data_parallel N`` batches shard over an N-device mesh
(replicated params; the jit partitioner inserts the grad/BN-stat psums over
ICI).  Ragged tail batches are padded by repeating the last sample so the
compiled geometry and the per-device shard count stay fixed; metrics count
only the real rows.
"""
from __future__ import annotations

import os
import pickle
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..convert.espnet_import import variables_to_state_dict
from ..convert.torch_pickle import load_torch_pickle, save_torch_legacy
from ..data import transforms as T
from ..data.dataset import DataLoader, SegmentationDataset
from ..data.load_data import LoadData
from ..eval.iou_eval import IouEval, confusion_matrix
from ..models.espnet import ESPNet, ESPNetEncoder
from .criteria import cross_entropy_2d


def net_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


class EspnetTrainer:
    def __init__(self, args):
        self.args = args
        self.class_weights = None
        self._step_cache: Dict = {}
        # multi-process (multi-host/DCN) runtime, before any device query
        # locks in the local-only backend; no-op unless configured via
        # --coordinator/--num_processes/--process_id or GSEG_* env
        from ..parallel.distributed import init_distributed

        init_distributed(getattr(args, "coordinator", None),
                         getattr(args, "num_processes", None),
                         getattr(args, "process_id", None))
        self.mesh = None
        n_dev = int(getattr(args, "data_parallel", 0) or 0)
        if n_dev:
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh(None if n_dev < 0 else n_dev)

    # ---------------- setup ----------------
    def load_data(self):
        args = self.args
        from ..parallel.distributed import barrier, is_primary

        if not os.path.isfile(args.cached_data_file):
            # multi-process: only process 0 scans the dataset and writes
            # the stats cache (shared filesystem); everyone else reads it
            # after the barrier
            if is_primary():
                data = LoadData(args.data_dir, args.classes,
                                args.cached_data_file).process_data()
                if data is None:
                    raise SystemExit(
                        "Error while pickling data. Please check.")
                barrier("gseg_data_cache")
                return data
            barrier("gseg_data_cache")
        with open(args.cached_data_file, "rb") as f:
            data = pickle.load(f)
        return data

    def build_loaders(self, data):
        args = self.args
        mean, std = data["mean"], data["std"]
        scale_in = args.scaleIn

        def pipeline(w, h, crop: Optional[int], flip_only=False):
            steps = [T.Normalize(mean, std), T.Scale(w, h)]
            if crop is not None:
                steps.append(T.RandomCropResize(crop))
            steps.append(T.RandomFlip())
            steps.append(T.ToTensor(scale_in))
            return T.Compose(steps)

        train_ds = partial(SegmentationDataset, data["trainIm"],
                           data["trainAnnot"])
        bs = args.batch_size
        prefetch = getattr(args, "prefetch", 1)
        loaders = {
            "scale1": DataLoader(train_ds(pipeline(1536, 768, 100)), bs,
                                 num_workers=args.num_workers, seed=1,
                                 prefetch=prefetch),
            "scale2": DataLoader(train_ds(pipeline(1280, 720, 100)), bs,
                                 num_workers=args.num_workers, seed=2,
                                 prefetch=prefetch),
            "scale4": DataLoader(train_ds(pipeline(512, 256, None)), bs + 4,
                                 num_workers=args.num_workers, seed=4,
                                 prefetch=prefetch),
            "scale3": DataLoader(train_ds(pipeline(768, 384, 32)), bs + 4,
                                 num_workers=args.num_workers, seed=3,
                                 prefetch=prefetch),
            "main": DataLoader(train_ds(pipeline(1024, 512, 32)), bs + 2,
                               num_workers=args.num_workers, seed=0,
                               prefetch=prefetch),
        }
        val_tf = T.Compose([T.Normalize(mean, std), T.Scale(1024, 512),
                            T.ToTensor(scale_in)])
        loaders["val"] = DataLoader(
            SegmentationDataset(data["valIm"], data["valAnnot"], val_tf),
            bs + 4, shuffle=False, num_workers=args.num_workers,
            prefetch=prefetch)
        return loaders

    def build_model(self):
        args = self.args
        # --bf16: convolutions/activations in bfloat16 on the MXU;
        # parameters, gradients (cast back through the weight casts),
        # optimizer state and BN statistics stay float32 (flax mixed
        # precision).  Default float32 matches the reference recipe
        # (module/espnet/train/main.py:227-234) bit-for-bit in spirit.
        dtype = jnp.bfloat16 if getattr(args, "bf16", False) else None
        if not args.decoder:
            model = ESPNetEncoder(args.classes, args.p, args.q, dtype=dtype)
            args.savedir = args.savedir + f"_enc_{args.p}_{args.q}/"
        else:
            model = ESPNet(args.classes, args.p, args.q, dtype=dtype)
            args.savedir = args.savedir + f"_dec_{args.p}_{args.q}/"
        return model

    def build_optimizer(self):
        args = self.args
        # torch Adam+weight_decay couples L2 into the gradient before the
        # moment updates (main.py:382); decay comes from --weight_decay
        # (reference default 5e-4)
        weight_decay = float(getattr(args, "weight_decay", 5e-4))
        self._lr_schedule = lambda epoch: args.lr * (
            0.5 ** (epoch // args.step_loss))
        tx = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
            ))(learning_rate=args.lr)
        return tx

    # ---------------- compiled steps ----------------
    def _pad_batch(self, x: np.ndarray, y: np.ndarray):
        """Pad a ragged batch to a multiple of the data-axis size by
        repeating the last sample (keeps one compiled geometry per scale
        and an even per-device shard). The step's `valid` mask drops the
        padded rows from the loss numerator AND denominator
        (criteria.cross_entropy_2d), so padding does not bias the
        gradient toward the repeated sample; only train-mode BN batch
        statistics see the duplicates. Returns (x, y, n_real)."""
        n = x.shape[0]
        if self.mesh is None:
            return x, y, n
        d = self.mesh.shape["data"]
        pad = (-n) % d
        if pad:
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
            y = np.concatenate([y, np.repeat(y[-1:], pad, axis=0)])
        return x, y, n

    def _put(self, arr: np.ndarray):
        """Explicit batch staging: jax.device_put rides the fast transfer
        channel on the axon tunnel (the implicit numpy->jit path can be
        ~40x slower once a large program has executed, CLAUDE.md); with a
        mesh the batch is placed pre-sharded over 'data' (multi-process:
        each process materializes only the shards its devices own)."""
        if self.mesh is None:
            return jax.device_put(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.distributed import put_global

        return put_global(NamedSharding(self.mesh, P("data")), arr)

    @staticmethod
    def _donate(training: bool):
        """Donate params/batch_stats/opt_state to the training step: the
        step returns their replacements, so XLA can update the ~1.4 MB
        state in place instead of allocating fresh buffers every step.
        CPU (the test mesh) does not implement donation and would warn
        per step, so donation is TPU-only."""
        if not training or jax.default_backend() == "cpu":
            return ()
        return (0, 1, 2)

    def _shard(self, step, training: bool):
        """Wrap a step function with data-parallel shardings over the mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())
        data = NamedSharding(self.mesh, P("data"))
        if training:
            return jax.jit(step,
                           in_shardings=(repl, repl, repl, data, data,
                                         data),
                           out_shardings=(repl, repl, repl, repl, repl),
                           donate_argnums=self._donate(training))
        return jax.jit(step, in_shardings=(repl, repl, data, data, data),
                       out_shardings=(repl, repl))

    def _get_step(self, model, tx, shape, training: bool):
        key = (shape, training)
        if key in self._step_cache:
            return self._step_cache[key]
        weights = self.class_weights

        if training:
            def step(params, batch_stats, opt_state, x, y, valid):
                def loss_fn(p):
                    out = model.apply(
                        {"params": p, "batch_stats": batch_stats}, x,
                        train=True, mutable=["batch_stats"])
                    logits, updates = out
                    # loss always reduces in f32 (bf16 log-softmax over
                    # 25-px logits loses ~2 decimal digits)
                    logits = logits.astype(jnp.float32)
                    return (cross_entropy_2d(logits, y, weights, valid),
                            (logits, updates["batch_stats"]))

                (loss, (logits, new_stats)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                # the metric confusion histogram accumulates in-jit: only
                # KxK ints cross device->host per step (the argmax map is
                # batch x 512 x 1024), and under a mesh the reduction is a
                # GSPMD psum — no process ever needs another's shard
                pred = jnp.argmax(logits, axis=-1)
                hist = confusion_matrix(pred, y, logits.shape[-1],
                                        sample_valid=valid)
                return params, new_stats, opt_state, loss, hist
        else:
            def step(params, batch_stats, x, y, valid):
                logits = model.apply(
                    {"params": params, "batch_stats": batch_stats}, x)
                logits = logits.astype(jnp.float32)
                loss = cross_entropy_2d(logits, y, weights, valid)
                hist = confusion_matrix(jnp.argmax(logits, axis=-1), y,
                                        logits.shape[-1], sample_valid=valid)
                return loss, hist

        if self.mesh is not None:
            step = self._shard(step, training)
            # multi-process: compile ahead-of-time and meet at a barrier
            # before the first collective executes (no-op single-process)
            from ..parallel.distributed import compile_aligned

            step = compile_aligned(
                step, f"train={training}:shape={shape}")
        else:
            step = jax.jit(step, donate_argnums=self._donate(training))
        self._step_cache[key] = step
        return step

    def train_epoch(self, model, tx, state, loader, epoch: int):
        args = self.args
        iou_eval = IouEval(args.classes)
        losses = []
        total = len(loader)
        for i, (x, y) in enumerate(loader):
            t0 = time.time()
            x, y, n_real = self._pad_batch(np.asarray(x), np.asarray(y))
            valid = np.arange(x.shape[0]) < n_real
            step = self._get_step(model, tx, x.shape, True)
            (state["params"], state["batch_stats"], state["opt_state"],
             loss, hist) = step(state["params"], state["batch_stats"],
                                state["opt_state"], self._put(x),
                                self._put(y), self._put(valid))
            loss = float(loss)
            losses.append(loss)
            iou_eval.add_hist(hist)
            print("[%d/%d] loss: %.3f time:%.2f" % (i, total, loss,
                                                    time.time() - t0))
        overall_acc, per_class_acc, per_class_iou, miou = iou_eval.get_metric()
        return (sum(losses) / max(len(losses), 1), overall_acc,
                per_class_acc, per_class_iou, miou)

    def val_epoch(self, model, tx, state, loader):
        args = self.args
        iou_eval = IouEval(args.classes)
        losses = []
        for i, (x, y) in enumerate(loader):
            x, y, n_real = self._pad_batch(np.asarray(x), np.asarray(y))
            valid = np.arange(x.shape[0]) < n_real
            step = self._get_step(model, tx, x.shape, False)
            loss, hist = step(state["params"], state["batch_stats"],
                              self._put(x), self._put(y),
                              self._put(valid))
            losses.append(float(loss))
            iou_eval.add_hist(hist)
        overall_acc, per_class_acc, per_class_iou, miou = iou_eval.get_metric()
        return (sum(losses) / max(len(losses), 1), overall_acc,
                per_class_acc, per_class_iou, miou)

    # ---------------- driver ----------------
    def run(self):
        args = self.args
        from ..parallel.distributed import host_replicated, is_primary

        primary = is_primary()
        data = self.load_data()
        model = self.build_model()
        os.makedirs(args.savedir, exist_ok=True)

        self.class_weights = jnp.asarray(data["classWeights"])
        print("Data statistics")
        print(data["mean"], data["std"])
        print(data["classWeights"])
        if primary:
            with open(os.path.join(args.savedir, "mean_std.txt"), "w") as f:
                f.write("mean[B G R]: {}\n".format(data["mean"]))
                f.write("std[B G R]: {}".format(data["std"]))

        loaders = self.build_loaders(data)

        example = jnp.zeros((1, 512, 1024, 3), jnp.float32)
        variables = model.init(jax.random.key(0), example, train=True)
        if args.decoder and args.pretrained and os.path.isfile(args.pretrained):
            from ..convert.espnet_import import state_dict_to_variables

            enc_sd = load_torch_pickle(args.pretrained)
            enc_vars = state_dict_to_variables(enc_sd)
            params = dict(variables["params"])
            params["encoder"] = enc_vars["params"]
            stats = dict(variables["batch_stats"])
            stats["encoder"] = enc_vars["batch_stats"]
            variables = {"params": params, "batch_stats": stats}
            print("Encoder loaded!")

        total_params = net_params(variables["params"])
        print("Total network parameters: " + str(total_params))
        if primary and getattr(args, "visualizeNet", False):
            # graph rendering equivalent (reference: VisualizeGraph.make_dot,
            # main.py:236-244): structured per-module summary
            from ..utils.summary import model_summary

            with open(os.path.join(args.savedir, "model.txt"), "w") as f:
                f.write(model_summary(variables["params"]))

        tx = self.build_optimizer()
        state = {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
            "opt_state": tx.init(variables["params"]),
        }
        if jax.process_count() > 1:
            # multi-process jit rejects single-device committed arrays as
            # replicated inputs; numpy leaves replicate onto the global
            # mesh at the first step (identical on every process: same
            # seed, same init)
            state = host_replicated(state)

        start_epoch = 0
        native_dir = os.path.abspath(os.path.join(args.savedir, "native_ckpt"))
        if args.resume:
            if os.path.isdir(native_dir):
                # full-state resume (params + BN stats + optimizer), an
                # improvement over the reference's weights-only resume
                # (main.py:360-370)
                import orbax.checkpoint as ocp

                with ocp.StandardCheckpointer() as ckptr:
                    restored = ckptr.restore(
                        native_dir,
                        {"state": jax.tree.map(np.asarray, state),
                         "epoch": 0})
                state = restored["state"]
                start_epoch = int(restored["epoch"])
                print("=> restored native checkpoint (epoch {})".format(
                    start_epoch))
            elif os.path.isfile(args.resumeLoc):
                ckpt = load_torch_pickle(args.resumeLoc)
                start_epoch = int(ckpt["epoch"])
                from ..convert.espnet_import import state_dict_to_variables

                resumed = state_dict_to_variables(ckpt["state_dict"])
                state["params"] = resumed["params"]
                state["batch_stats"] = resumed["batch_stats"]
                print("=> loaded checkpoint (epoch {})".format(start_epoch))
            else:
                print("=> no checkpoint found at '{}'".format(args.resumeLoc))

        log_path = os.path.join(args.savedir, args.logFile)
        new_log = not os.path.isfile(log_path)
        logger = open(log_path, "a" if not new_log else "w") if primary \
            else open(os.devnull, "w")
        if new_log:
            logger.write("Parameters: %s" % (str(total_params)))
            logger.write("\n%s\t%s\t%s\t%s\t%s\t%s\t" % (
                "Epoch", "Loss (train)", "Loss (val)", "mIoU (train)",
                "mIoU (val)", "Learning rate"))
        logger.flush()

        for epoch in range(start_epoch, args.max_epochs):
            lr = self._lr_schedule(epoch)
            # numpy, not jnp: a fresh single-device array inside the
            # otherwise-global opt_state tree is rejected by multi-process
            # jit; a host scalar replicates cleanly in every mode
            state["opt_state"].hyperparams["learning_rate"] = np.asarray(
                lr, np.float32)
            print("Learning rate: " + str(lr))

            for name in ("scale1", "scale2", "scale4", "scale3"):
                print(name)
                self.train_epoch(model, tx, state, loaders[name], epoch)
            print("scale main")
            (loss_tr, overall_acc_tr, per_class_acc_tr, per_class_iou_tr,
             miou_tr) = self.train_epoch(model, tx, state, loaders["main"],
                                         epoch)
            print("validation")
            (loss_val, overall_acc_val, per_class_acc_val, per_class_iou_val,
             miou_val) = self.val_epoch(model, tx, state, loaders["val"])

            # native full-state checkpoint (orbax) for exact resume.
            # COLLECTIVE: every process must participate — orbax's
            # checkpointer runs sync_global_processes internally, so
            # gating it on `primary` deadlocks rank 0 against ranks that
            # skipped the call (observed: gloo DEADLINE_EXCEEDED on a
            # cross-process pair communicator).  Orbax itself writes the
            # replicated (numpy) tree from the primary host only.
            import orbax.checkpoint as ocp
            import shutil

            from ..parallel.distributed import barrier

            tmp_dir = native_dir + ".tmp"
            if primary and os.path.isdir(tmp_dir):
                shutil.rmtree(tmp_dir)
            barrier(f"gseg_ckpt_pre_{epoch}")  # tmp cleared before saving
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(tmp_dir,
                           {"state": jax.tree.map(np.asarray, state),
                            "epoch": epoch + 1})
            if primary:
                if os.path.isdir(native_dir):
                    shutil.rmtree(native_dir)
                os.rename(tmp_dir, native_dir)
            barrier(f"gseg_ckpt_done_{epoch}")  # visible before anyone resumes

            if not primary:
                # torch-format checkpoints/logs are process-0 artifacts;
                # replicated state is identical on every process by
                # construction
                continue
            state_dict = variables_to_state_dict({
                "params": jax.tree.map(np.asarray, state["params"]),
                "batch_stats": jax.tree.map(np.asarray,
                                            state["batch_stats"]),
            })
            save_torch_legacy({
                "epoch": epoch + 1,
                "arch": repr(model),
                "state_dict": state_dict,
                "lossTr": float(loss_tr),
                "lossVal": float(loss_val),
                "iouTr": float(miou_tr),
                "iouVal": float(miou_val),
                "lr": lr,
            }, os.path.join(args.savedir, "checkpoint.pth.tar"))
            save_torch_legacy(
                state_dict,
                os.path.join(args.savedir, f"model_{epoch + 1}.pth"))

            with open(os.path.join(args.savedir, f"acc_{epoch}.txt"),
                      "w") as log:
                log.write(
                    "\nEpoch: %d\t Overall Acc (Tr): %.4f\t Overall Acc "
                    "(Val): %.4f\t mIOU (Tr): %.4f\t mIOU (Val): %.4f"
                    % (epoch, overall_acc_tr, overall_acc_val, miou_tr,
                       miou_val))
                log.write("\n")
                log.write("Per Class Training Acc: " + str(per_class_acc_tr))
                log.write("\n")
                log.write("Per Class Validation Acc: "
                          + str(per_class_acc_val))
                log.write("\n")
                log.write("Per Class Training mIOU: " + str(per_class_iou_tr))
                log.write("\n")
                log.write("Per Class Validation mIOU: "
                          + str(per_class_iou_val))

            logger.write("\n%d\t%.4f\t%.4f\t%.4f\t%.4f\t%.7f"
                         % (epoch, loss_tr, loss_val, miou_tr, miou_val, lr))
            logger.flush()
            print("Epoch : " + str(epoch) + " Details")
            print("\nEpoch No.: %d\tTrain Loss = %.4f\tVal Loss = %.4f\t "
                  "mIOU(tr) = %.4f\t mIOU(val) = %.4f"
                  % (epoch, loss_tr, loss_val, miou_tr, miou_val))
        logger.close()


def train_validate_segmentation(args):
    EspnetTrainer(args).run()
