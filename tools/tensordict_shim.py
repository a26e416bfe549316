"""Minimal tensordict stand-in for driving the REAL reference package.

The benchmark harness (bench_vpinn.py) drives /root/reference's actual
``torch_fem`` code as its CPU baseline, but ``tensordict`` is not installed
in this image. The reference uses a narrow slice of the API — nested
string/tuple getitem, setitem, ``batch_size``, ``auto_batch_size_`` and
``tensordict.stack`` — implemented here over plain dicts. Install as

    import tools.tensordict_shim as tensordict_shim
    sys.modules["tensordict"] = tensordict_shim

BEFORE importing torch_fem. Benchmark scaffolding only: not part of the
library, not a tensordict reimplementation (no views, no devices, no lazy
stacking).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional


class TensorDict:
    def __init__(self, data: Optional[Dict[str, Any]] = None, batch_size=None):
        self._data: Dict[str, Any] = dict(data or {})
        self.batch_size: List[int] = list(batch_size) if batch_size else []

    # -- mapping surface ---------------------------------------------------

    def __getitem__(self, key):
        if isinstance(key, tuple):
            out = self
            for k in key:
                out = out[k]
            return out
        return self._data[key]

    def __setitem__(self, key, value):
        if isinstance(key, tuple):
            target = self
            for k in key[:-1]:
                if k not in target._data:
                    target._data[k] = TensorDict({})
                target = target._data[k]
            target._data[key[-1]] = value
        else:
            self._data[key] = value

    def __contains__(self, key):
        return key in self._data

    def keys(self):
        return self._data.keys()

    def values(self):
        return self._data.values()

    def items(self):
        return self._data.items()

    # -- reference-used helpers -------------------------------------------

    def auto_batch_size_(self):
        """Set batch_size to the common leading-dim length of the leaves
        (shallow approximation — enough for the reference's usage)."""
        lengths = set()
        for v in self._data.values():
            if isinstance(v, TensorDict):
                v.auto_batch_size_()
            elif hasattr(v, "shape") and len(v.shape) > 0:
                lengths.add(int(v.shape[0]))
        if len(lengths) == 1:
            self.batch_size = [lengths.pop()]
        return self


def stack(tds, dim: int = 0):
    """Stack equal-structure TensorDicts along a new leading axis."""
    import torch

    first = tds[0]
    out = TensorDict({}, batch_size=[len(tds)] + list(first.batch_size))
    for key in first.keys():
        vals = [td[key] for td in tds]
        if isinstance(vals[0], TensorDict):
            out[key] = stack(vals, dim)
        else:
            out[key] = torch.stack(vals, dim=dim)
    return out
