"""pulser_diff_tpu — TPU-native differentiable pulse-level quantum emulator.

A from-scratch JAX/XLA re-design with the capabilities of pulser-diff
(differentiable Pulser backend): sequence building, Rydberg/XY Hamiltonian
assembly, Schrodinger/Lindblad solvers with end-to-end autodiff, noise
models, measurement sampling and a training-model API.

Public surface (reference __init__.py:17-18 exports TorchEmulator and
SimConfig; the rest is imported from submodules, as the notebooks do):

    from pulser_diff_tpu import TpuEmulator, SimConfig
    from pulser_diff_tpu.model import QuantumModel
    from pulser_diff_tpu.derivative import deriv_time, deriv_param
"""

from pulser_diff_tpu import config as _config  # noqa: F401  (enables x64)
from pulser_diff_tpu.backend import TorchEmulator, TpuEmulator
from pulser_diff_tpu.cplx import Cplx
from pulser_diff_tpu.derivative import deriv_param, deriv_time
from pulser_diff_tpu.model import QuantumModel
from pulser_diff_tpu.simconfig import NoiseModel, SimConfig
from pulser_diff_tpu.solvers import SolverType

__version__ = "0.1.0"

__all__ = [
    "TpuEmulator",
    "TorchEmulator",
    "QuantumModel",
    "SimConfig",
    "NoiseModel",
    "SolverType",
    "Cplx",
    "deriv_time",
    "deriv_param",
]
