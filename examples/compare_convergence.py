"""Overlay FEM vs VPINN convergence from the two pickles + decay-rate fits.

Port of /root/reference/examples/compare_convergence.py:7-61.
"""

import pathlib
import pickle
import sys

import common  # noqa: F401  (configures platform/x64)
import numpy as np

_here = pathlib.Path(__file__).parent
for _name in ("H1_norm_converge_FEM.pkl", "H1_norm_converge_NN.pkl"):
    if not (_here / _name).exists():
        sys.exit(
            f"{_name} not found - run example_fractures_fem_convergence.py "
            "and example_fractures_nn_convergence.py first"
        )
with open(pathlib.Path(__file__).parent / "H1_norm_converge_FEM.pkl", "rb") as fh:
    fem_dofs, fem_h1 = pickle.load(fh)
with open(pathlib.Path(__file__).parent / "H1_norm_converge_NN.pkl", "rb") as fh:
    nn_dofs, nn_h1 = pickle.load(fh)

fem_rate = np.polyfit(np.log(fem_dofs), np.log(fem_h1), 1)[0]
nn_rate = np.polyfit(np.log(nn_dofs), np.log(nn_h1), 1)[0]
print(f"FEM decay rate vs #DOFs:   {fem_rate:.3f}")
print(f"VPINN decay rate vs #DOFs: {nn_rate:.3f}")

if common.SHOW_PLOTS:
    import matplotlib.pyplot as plt

    plt.loglog(fem_dofs, fem_h1, "o-", label=f"FEM (rate {fem_rate:.2f})")
    plt.loglog(nn_dofs, nn_h1, "s--", label=f"VPINN (rate {nn_rate:.2f})")
    plt.xlabel("# DOFs")
    plt.ylabel("relative H1 error")
    plt.legend()
    plt.show()
