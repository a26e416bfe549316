"""Training harness for VPINN models.

Parity surface: reference ``Model`` (/root/reference/torch_fem/model/model.py:9-135)
— user-supplied ``training_step(nn) -> (loss, validation_loss, accuracy)``,
epoch loop with optimizer + optional plateau scheduler, early stopping,
best-parameter snapshot, history tracking, optional tqdm + matplotlib.

TPU-native differences:

* the *entire* step — assembly-based loss, double backward through the
  network's input gradients, optimizer update — is one jitted function; the
  host only sees three scalars per epoch;
* checkpointing to disk (``save_checkpoint``/``load_checkpoint``) is a
  superset of the reference's in-memory-only snapshot (model.py:56,79,87);
* optimizers/schedulers are optax transforms (plateau scheduling via
  ``optax.contrib.reduce_on_plateau`` replaces torch's ReduceLROnPlateau).
"""

from __future__ import annotations

import re
import time
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _treedef_signature(treedef) -> str:
    """Process-stable architecture signature of a pytree structure.

    ``str(treedef)`` embeds the memory addresses of any function leaves in
    the structure metadata (``<function tanh at 0x7f...>``), which differ
    between interpreter runs — comparing raw strings would reject every
    checkpoint loaded in a fresh process. Strip the addresses; the function
    names and the tree shape remain, which is what identifies the
    architecture.
    """
    return re.sub(r"0x[0-9a-fA-F]+", "0x", str(treedef))


class Model:
    """Trains a neural-network trial function against a variational loss."""

    def __init__(
        self,
        neural_network,
        training_step: Callable,
        epochs: int = 5000,
        optimizer: Any = optax.adam,
        optimizer_kwargs: Optional[dict] = None,
        learning_rate_scheduler: Optional[Any] = None,
        scheduler_kwargs: Optional[dict] = None,
        use_early_stopping: bool = False,
        early_stopping_patience: int = 10,
        min_delta: float = 1e-12,
        jit: bool = True,
        progress_bar: bool = True,
        training_state0: Any = None,
    ):
        self._neural_network = neural_network
        self._training_step = training_step
        self._epochs = int(epochs)
        # stateful protocol: with ``training_state0`` given, training_step
        # is called as ``training_step(nn, state) -> ((loss, validation,
        # accuracy), new_state)`` and the state rides the epoch loop /
        # scan carry. Intended for cross-epoch warm starts (e.g. the
        # previous epoch's Gram-solve iterate, VERDICT r04 item 3); the
        # state must not affect the loss value's gradient (warm starts are
        # stop_gradient'ed by gram_solver).
        self._stateful = training_state0 is not None
        self._training_state0 = jax.tree_util.tree_map(
            jnp.asarray, training_state0
        )
        self._training_state = self._training_state0

        if optimizer_kwargs is None:
            optimizer_kwargs = {"learning_rate": 0.001}
        # accept torch-style {"lr": ...}
        if "lr" in optimizer_kwargs:
            optimizer_kwargs = dict(optimizer_kwargs)
            optimizer_kwargs["learning_rate"] = optimizer_kwargs.pop("lr")

        if isinstance(optimizer, optax.GradientTransformation):
            tx = optimizer
        else:
            tx = optimizer(**optimizer_kwargs)

        if learning_rate_scheduler is not None:
            if scheduler_kwargs is None:
                scheduler_kwargs = {}
            if learning_rate_scheduler == "reduce_on_plateau":
                sched = optax.contrib.reduce_on_plateau(**scheduler_kwargs)
            elif isinstance(learning_rate_scheduler, optax.GradientTransformation):
                sched = learning_rate_scheduler
            else:
                sched = learning_rate_scheduler(**scheduler_kwargs)
            tx = optax.chain(tx, sched)
            self._scheduler_active = True
        else:
            self._scheduler_active = False

        self._tx = tx
        self._opt_state = tx.init(self._nn_params(neural_network))

        self._use_early_stopping = use_early_stopping
        self._early_stopping_patience = int(early_stopping_patience)
        self._min_delta = float(min_delta)
        self._progress_bar = progress_bar

        self._loss_history: list[float] = []
        self._validation_loss_history: list[float] = []
        self._accuracy_history: list[float] = []
        self._epoch_times: list[float] = []

        self._best_loss = float("inf")
        self.optimal_parameters = self._nn_params(neural_network)
        self.early_stopping_counter = 0

        step = self._make_step()
        self._step = jax.jit(step) if jit else step

    # -- internals ---------------------------------------------------------

    @staticmethod
    def _nn_params(nn):
        """The trainable leaves: the network pytree itself."""
        return nn

    def _make_step(self):
        training_step = self._training_step
        tx = self._tx
        scheduler_active = self._scheduler_active

        if self._stateful:

            def loss_fn_s(nn, state):
                (loss, validation, accuracy), new_state = training_step(
                    nn, state
                )
                return jnp.squeeze(loss), (
                    jnp.squeeze(validation),
                    jnp.squeeze(accuracy),
                    new_state,
                )

            def step_s(nn, opt_state, state):
                (loss, (validation, accuracy, new_state)), grads = (
                    jax.value_and_grad(loss_fn_s, has_aux=True)(nn, state)
                )
                if scheduler_active:
                    updates, opt_state = tx.update(
                        grads, opt_state, params=nn, value=loss
                    )
                else:
                    updates, opt_state = tx.update(grads, opt_state, params=nn)
                nn = optax.apply_updates(nn, updates)
                return nn, opt_state, new_state, loss, validation, accuracy

            return step_s

        def loss_fn(nn):
            loss, validation, accuracy = training_step(nn)
            return jnp.squeeze(loss), (jnp.squeeze(validation), jnp.squeeze(accuracy))

        def step(nn, opt_state):
            (loss, (validation, accuracy)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(nn)
            if scheduler_active:
                updates, opt_state = tx.update(
                    grads, opt_state, params=nn, value=loss
                )
            else:
                updates, opt_state = tx.update(grads, opt_state, params=nn)
            nn = optax.apply_updates(nn, updates)
            return nn, opt_state, loss, validation, accuracy

        return step

    # -- public API --------------------------------------------------------

    def train(self):
        """Run the epoch loop; returns the trained network."""
        nn = self._neural_network
        opt_state = self._opt_state
        state = self._training_state

        iterator = range(self._epochs)
        bar = None
        if self._progress_bar:
            try:
                import tqdm

                bar = tqdm.tqdm(iterator, desc="Training Progress")
                iterator = bar
            except ImportError:
                pass

        for _ in iterator:
            t0 = time.perf_counter()
            if self._stateful:
                nn_new, opt_state_new, state_new, loss, validation, accuracy = (
                    self._step(nn, opt_state, state)
                )
            else:
                nn_new, opt_state_new, loss, validation, accuracy = self._step(
                    nn, opt_state
                )
                state_new = state

            loss_value = float(loss)
            validation_value = float(validation)
            accuracy_value = float(accuracy)
            self._epoch_times.append(time.perf_counter() - t0)
            # history first, aligned with _epoch_times — the guard/early-stop
            # paths below must not drop the epoch they evaluated
            self._loss_history.append(loss_value)
            self._validation_loss_history.append(validation_value)
            self._accuracy_history.append(accuracy_value)

            # failure guard (SURVEY.md §5: the reference has none): a
            # non-finite loss poisons parameters and the optimizer state —
            # skip the update and fall back to the best snapshot
            if not np.isfinite(loss_value):
                nn = self.optimal_parameters
                opt_state = self._tx.init(nn)
                # a NaN epoch may have poisoned the warm-start state too
                state = self._training_state0
                self._diverged_steps = getattr(self, "_diverged_steps", 0) + 1
                if self._diverged_steps > 10:
                    break
                continue

            # snapshot the parameters that ACHIEVED loss_value (the
            # pre-update ones) before stepping
            if self._use_early_stopping:
                if loss_value < self._best_loss - self._min_delta:
                    self._best_loss = loss_value
                    self.early_stopping_counter = 0
                    self.optimal_parameters = nn
                else:
                    self.early_stopping_counter += 1
                    if self.early_stopping_counter >= self._early_stopping_patience:
                        break
            elif loss_value < self._best_loss:
                self._best_loss = loss_value
                self.optimal_parameters = nn

            nn, opt_state, state = nn_new, opt_state_new, state_new

            if bar is not None:
                bar.set_postfix(
                    {
                        "Loss": f"{loss_value:.8f}",
                        "Validation loss": f"{validation_value:.8f}",
                        "Accuracy": f"{accuracy_value:.8f}",
                    }
                )

        self._neural_network = nn
        self._opt_state = opt_state
        self._training_state = state
        return nn

    def train_compiled(self, block_size: int = 100):
        """Scanned epoch-block training: ``block_size`` epochs per dispatch.

        The eager :meth:`train` dispatches one jitted step per epoch; on a
        tunneled TPU each dispatch pays the ~31 ms host round-trip, which
        dwarfs the compute of small training steps. This path runs
        ``lax.scan`` over ``block_size`` epochs inside ONE jit with a
        donated carry — parameters, optimizer state and the best-parameter
        snapshot never leave the device — and syncs with the host once per
        block to record histories.

        Per-epoch math is identical to :meth:`train`; the control-flow
        semantics differ only where the host used to intervene mid-epoch:

        * best-snapshot tracking runs in-scan (the parameters achieving the
          lowest finite loss ride the carry),
        * a non-finite loss *holds* parameters and optimizer state for that
          epoch (the eager loop resets to the snapshot and re-inits the
          optimizer); more than 10 non-finite epochs aborts at the next
          block edge,
        * early stopping replays the exact per-epoch patience rule on the
          block's downloaded losses and truncates the histories at the
          epoch the eager loop would have stopped at; on a mid-block stop
          the block is re-run from its retained start state for exactly
          the epochs the eager loop ran (the scan body is one fixed
          compiled sub-computation, so the shorter scan reproduces the
          stop-point parameters and best snapshot bitwise — nothing
          drifts past the stopping point); the live network is then
          restored to the best snapshot.

        Works unchanged when ``training_step`` closes over a basis sharded
        with :func:`parallel.shard_basis_cells`: the scan body's integrals
        compute on local cells per device and XLA inserts the cross-device
        reductions (one psum per assembled vector), so multi-chip training
        needs no further code.

        Ref epoch-loop contract: torch_fem/model/model.py:61-99.
        """
        block_size = max(1, int(block_size))
        step = self._make_step()
        use_es, min_delta = self._use_early_stopping, self._min_delta
        stateful, state0 = self._stateful, self._training_state0

        def epoch_body(carry, _):
            nn, opt_state, best_loss, best_nn, n_bad, state = carry
            if stateful:
                nn_new, opt_new, state_new, loss, validation, accuracy = step(
                    nn, opt_state, state
                )
            else:
                nn_new, opt_new, loss, validation, accuracy = step(nn, opt_state)
                state_new = state
            finite = jnp.isfinite(loss)
            keep = lambda a, b: jnp.where(finite, a, b)
            nn_next = jax.tree_util.tree_map(keep, nn_new, nn)
            opt_next = jax.tree_util.tree_map(keep, opt_new, opt_state)
            # a NaN epoch resets the warm-start state to its initial value
            # (the eager loop does the same)
            reset = state if not stateful else state0
            state_next = jax.tree_util.tree_map(keep, state_new, reset)
            margin = min_delta if use_es else 0.0
            improved = finite & (loss < best_loss - margin)
            best_nn = jax.tree_util.tree_map(
                lambda a, b: jnp.where(improved, a, b), nn, best_nn
            )
            best_loss = jnp.where(improved, loss, best_loss)
            n_bad = n_bad + jnp.where(finite, 0, 1)
            return (
                (nn_next, opt_next, best_loss, best_nn, n_bad, state_next),
                (loss, validation, accuracy),
            )

        @partial(jax.jit, donate_argnums=0, static_argnums=1)
        def run_block(carry, length):
            return jax.lax.scan(epoch_body, carry, None, length=length)

        loss0 = jnp.asarray(self._best_loss)
        # materialized copies: the carry is donated, so nothing the Model
        # (or the user) still holds may alias into it — the live
        # ``self._neural_network`` / ``self._opt_state`` buffers must
        # survive an interrupt mid-loop, and ``nn`` appears twice in the
        # carry (donation must not alias one buffer into two outputs)
        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
        carry = (
            copy(self._neural_network),
            copy(self._opt_state),
            loss0,
            copy(self._neural_network),
            jnp.zeros((), jnp.int32),
            copy(self._training_state),
        )

        done = 0
        stopped = False
        while done < self._epochs and not stopped:
            length = min(block_size, self._epochs - done)
            if use_es:
                # retained block-start state: run_block donates its input,
                # and a mid-block stop re-enters the block below
                carry_in = copy(carry)
            t0 = time.perf_counter()
            carry, (losses, validations, accuracies) = run_block(carry, length)
            losses = np.asarray(losses)  # host sync, once per block
            block_dt = (time.perf_counter() - t0) / length
            validations, accuracies = np.asarray(validations), np.asarray(accuracies)
            done += length

            # replay the eager per-epoch bookkeeping on the block's scalars
            stop_epoch = None
            for e in range(length):
                self._epoch_times.append(block_dt)
                self._loss_history.append(float(losses[e]))
                self._validation_loss_history.append(float(validations[e]))
                self._accuracy_history.append(float(accuracies[e]))
                lv = float(losses[e])
                if not np.isfinite(lv):
                    continue
                if use_es:
                    if lv < self._best_loss - self._min_delta:
                        self._best_loss = lv
                        self.early_stopping_counter = 0
                    else:
                        self.early_stopping_counter += 1
                        if (
                            self.early_stopping_counter
                            >= self._early_stopping_patience
                        ):
                            # histories are appended per epoch above, so
                            # breaking here leaves them exactly where the
                            # eager loop would have stopped
                            stopped = True
                            stop_epoch = e
                            break
                elif lv < self._best_loss:
                    self._best_loss = lv
            if stop_epoch is not None and stop_epoch + 1 < length:
                # the scan computed the whole block, so the carried
                # parameters and best snapshot include epochs AFTER the
                # stopping point — epochs the eager loop never runs. The
                # scan body is one fixed compiled sub-computation (length
                # only sets how many times it is applied), so re-running
                # the block for exactly stop_epoch+1 epochs reproduces the
                # eager loop's stop-point state bitwise.
                carry, _ = run_block(carry_in, stop_epoch + 1)
            if int(carry[4]) > 10:
                stopped = True

        nn, opt_state, _, best_nn, _, state = carry
        self.optimal_parameters = best_nn
        self._neural_network = best_nn if stopped else nn
        self._opt_state = opt_state
        self._training_state = state
        return self._neural_network

    @property
    def neural_network(self):
        return self._neural_network

    def get_training_history(self):
        return (
            self._loss_history,
            self._validation_loss_history,
            self._accuracy_history,
        )

    def load_optimal_parameters(self):
        """Restore the best-seen parameters into the live network."""
        self._neural_network = self.optimal_parameters
        return self._neural_network

    # -- checkpointing (superset of the reference, SURVEY.md §5) -----------

    def save_checkpoint(self, path: str):
        """Serialize parameters, optimizer state + history to ``path`` (.npz).

        Superset of the reference's in-memory snapshot (model.py:56,79,87):
        including the optimizer state makes resumed training bitwise-
        continuous (Adam moments survive the restart).
        """
        leaves, treedef = jax.tree_util.tree_flatten(self._neural_network)
        arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
        opt_leaves, _ = jax.tree_util.tree_flatten(self._opt_state)
        arrays.update(
            {f"opt_{i}": np.asarray(x) for i, x in enumerate(opt_leaves)}
        )
        # architecture signature: validated on load so a checkpoint never
        # silently restores into a different network shape
        arrays["treedef"] = np.array(_treedef_signature(treedef))
        arrays["leaf_shapes"] = np.array(
            [str(tuple(np.shape(x))) for x in leaves]
        )
        arrays["loss_history"] = np.asarray(self._loss_history)
        arrays["validation_loss_history"] = np.asarray(self._validation_loss_history)
        arrays["accuracy_history"] = np.asarray(self._accuracy_history)
        np.savez(path, **arrays)

    def load_checkpoint(self, path: str):
        """Restore parameters, optimizer state and histories.

        Raises ``ValueError`` if the checkpoint's architecture signature
        (pytree structure + leaf shapes) does not match the live network.
        Checkpoints written before optimizer state was included restore the
        parameters and keep the freshly initialized optimizer.
        """
        data = np.load(path)
        leaves, treedef = jax.tree_util.tree_flatten(self._neural_network)
        if "treedef" in data and _treedef_signature(
            str(data["treedef"])
        ) != _treedef_signature(treedef):
            raise ValueError(
                f"checkpoint {path!r} was written for a different network "
                f"architecture:\n  checkpoint: {data['treedef']}\n"
                f"  live:       {treedef}"
            )
        saved_shapes = [
            str(s) for s in data["leaf_shapes"]
        ] if "leaf_shapes" in data else None
        live_shapes = [str(tuple(np.shape(x))) for x in leaves]
        if saved_shapes is not None and saved_shapes != live_shapes:
            bad = [
                f"leaf {i}: checkpoint {s} vs live {l}"
                for i, (s, l) in enumerate(zip(saved_shapes, live_shapes))
                if s != l
            ]
            raise ValueError(
                f"checkpoint {path!r} leaf shapes do not match the live "
                "network: " + "; ".join(bad[:5])
            )
        new_leaves = [
            jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))
        ]
        self._neural_network = jax.tree_util.tree_unflatten(treedef, new_leaves)
        opt_leaves, opt_treedef = jax.tree_util.tree_flatten(self._opt_state)
        if "opt_0" in data or len(opt_leaves) == 0:
            restored = [
                jnp.asarray(data[f"opt_{i}"]) for i in range(len(opt_leaves))
            ]
            self._opt_state = jax.tree_util.tree_unflatten(
                opt_treedef, restored
            )
        self._loss_history = list(data["loss_history"])
        self._validation_loss_history = list(data["validation_loss_history"])
        self._accuracy_history = list(data["accuracy_history"])
        return self._neural_network

    def plot_training_history(self, plot_names: Optional[dict] = None):
        """Semilogy plot of loss/validation/accuracy histories (needs matplotlib)."""
        import matplotlib.pyplot as plt

        if plot_names is None:
            plot_names = {
                "loss": "Training loss",
                "validation": "Validation loss",
                "accuracy": "Accuracy",
                "title": "Training history",
            }

        _, axis = plt.subplots()
        axis.semilogy(self._loss_history, linestyle="-", label=plot_names["loss"])
        axis.semilogy(
            self._validation_loss_history,
            linestyle="--",
            label=plot_names["validation"],
        )
        axis.semilogy(
            self._accuracy_history, linestyle=":", label=plot_names["accuracy"]
        )
        axis.set_xlabel("# Epochs")
        axis.set_ylabel("Loss")
        axis.set_title(plot_names["title"])
        axis.legend()
        return axis
