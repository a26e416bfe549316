"""Global configuration for the TPU FEM framework.

The reference library configures precision globally via
``torch.set_default_dtype`` (e.g. /root/reference/examples/example_jump.py:22).
Here the equivalent is JAX's x64 switch plus a library-level default dtype:
FEM correctness studies want float64 (available on CPU and, emulated, on TPU),
while the TPU fast path runs float32 with float64 reductions where needed.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class _Config:
    """Mutable library configuration (host-side only, never traced)."""

    #: dtype used for newly-built mesh/basis arrays.
    default_dtype: jnp.dtype | None = None


_config = _Config()


def use_x64(enable: bool = True) -> None:
    """Enable float64 globally (parity with torch.set_default_dtype(float64))."""
    jax.config.update("jax_enable_x64", enable)


def set_default_dtype(dtype) -> None:
    """Set the dtype used for newly constructed meshes/bases."""
    _config.default_dtype = jnp.dtype(dtype)


def default_dtype() -> jnp.dtype:
    """Return the dtype for real-valued FEM arrays.

    Defaults to float64 when x64 is enabled, float32 otherwise.
    """
    if _config.default_dtype is not None:
        return _config.default_dtype
    return jnp.dtype(jnp.float64) if jax.config.jax_enable_x64 else jnp.dtype(
        jnp.float32
    )


def index_dtype() -> jnp.dtype:
    """Integer dtype for connectivity / DOF indices (int32 fits MXU-era TPUs)."""
    return jnp.dtype(jnp.int32)


def construct_on_host(init):
    """Decorator: run a constructor under ``setup_device_context()``.

    Applied to mesh/basis ``__init__`` so eager construction math never
    dispatches op-by-op to a remote accelerator (see below).
    """
    import functools

    @functools.wraps(init)
    def wrapped(self, *args, **kwargs):
        with setup_device_context():
            return init(self, *args, **kwargs)

    return wrapped


class HostConstructed:
    """Mixin: every (sub)class ``__init__`` runs under the host CPU device.

    Base classes for meshes and bases inherit this once; the hook wraps each
    class's own ``__init__`` (including the direct subclass of the mixin) in
    ``construct_on_host``, so eager construction math never pays the remote
    accelerator's per-op round trip.
    """

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        if "__init__" in cls.__dict__:
            cls.__init__ = construct_on_host(cls.__dict__["__init__"])


def setup_device_context():
    """Device context for *eager construction* math (mesh/basis build).

    Construction runs op-by-op outside jit; on remote-tunneled accelerators
    (the axon TPU plugin) every eager dispatch pays the tunnel round trip
    (~31 ms), turning a 2-second basis build into minutes. Construction-time
    arrays are therefore committed to the host CPU backend; jitted compute
    closes over them and XLA ships them to the accelerator once at compile
    time, so the hot path is unaffected.
    """
    import contextlib

    try:
        cpu = jax.local_devices(backend="cpu")
    except RuntimeError:
        return contextlib.nullcontext()
    if not cpu:
        return contextlib.nullcontext()
    return jax.default_device(cpu[0])
