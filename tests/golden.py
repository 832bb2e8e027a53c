"""Independent numpy/scipy golden model.

Builds the dense time-dependent Hamiltonian straight from a Sequence with
plain numpy kron products and integrates with scipy's DOP853 at tight
tolerance.  Shares no code with the pulser_diff_tpu compute path — this
plays the role the QutipEmulator golden model plays in the reference's
test suite (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
from scipy.integrate import solve_ivp

import jax

SIGMA = {
    # ground-rydberg basis: |r>=0, |g>=1
    "ground-rydberg": {
        "amp": np.array([[0, 0], [1, 0]], dtype=complex),  # |g><r|
        "det": np.array([[1, 0], [0, 0]], dtype=complex),  # |r><r|
        "occ": np.array([[1, 0], [0, 0]], dtype=complex),
        "ground_index": 1,
    },
    # digital basis: |g>=0, |h>=1
    "digital": {
        "amp": np.array([[0, 0], [1, 0]], dtype=complex),  # |h><g|
        "det": np.array([[1, 0], [0, 0]], dtype=complex),  # |g><g|
        "occ": None,
        "ground_index": 0,
    },
    # XY basis: |u>=0, |d>=1
    "XY": {
        "amp": np.array([[0, 0], [1, 0]], dtype=complex),  # |d><u|
        "det": np.array([[1, 0], [0, 0]], dtype=complex),  # |u><u|
        "occ": None,
        "ground_index": 0,
    },
}


def _lift(op: np.ndarray, site: int, n: int, d: int) -> np.ndarray:
    out = np.array([[1.0 + 0j]])
    for k in range(n):
        out = np.kron(out, op if k == site else np.eye(d, dtype=complex))
    return out


def _np(x) -> np.ndarray:
    return np.asarray(jax.device_get(x), dtype=float)


def dense_hamiltonian_terms(seq, coords_override=None):
    """Extract per-qubit 1-ns amp/det/phase arrays + interaction matrix
    from a (concrete) Sequence, as plain numpy."""
    from pulser_diff_tpu.core.sampler import sample

    reg = seq.register
    qids = list(reg.qubit_ids)
    n = len(qids)
    coords = {q: _np(c) for q, c in reg.qubits.items()}
    if coords_override:
        coords.update({q: np.asarray(c, dtype=float) for q, c in coords_override.items()})
    ss = sample(seq).globalize(tuple(qids)).extend_duration(
        seq.get_duration() + 1, hold_edge=True
    )
    nested = ss.to_nested_dict(all_local=True)

    per_qubit = {}  # basis -> qid -> dict(amp, det, phase)
    for basis, qd in nested["Local"].items():
        per_qubit[basis] = {
            q: {k: _np(v) for k, v in d.items()} for q, d in qd.items()
        }

    dim = 3 if len(per_qubit) > 1 else 2
    in_xy = ss._in_xy
    basis_name = (
        "XY"
        if in_xy
        else (
            "all"
            if dim == 3
            else ("ground-rydberg" if "ground-rydberg" in per_qubit else "digital")
        )
    )
    T = ss.max_duration
    return qids, coords, per_qubit, basis_name, dim, T, ss


def golden_h_of_t(seq, device, coords_override=None):
    """Returns (H(t_us) callable, dim_total, T_ns, ground_state_index_fn)."""
    qids, coords, per_qubit, basis_name, dim, T, ss = dense_hamiltonian_terms(
        seq, coords_override
    )
    n = len(qids)
    dim_site = 3 if basis_name == "all" else 2

    # basis orderings must match the framework's tables
    if basis_name == "all":
        labels = ["r", "g", "h"]
    elif basis_name == "ground-rydberg":
        labels = ["r", "g"]
    elif basis_name == "digital":
        labels = ["g", "h"]
    else:
        labels = ["u", "d"]

    def op(name):
        b1, b2 = name[0], name[1]
        m = np.zeros((dim_site, dim_site), dtype=complex)
        m[labels.index(b1), labels.index(b2)] = 1.0
        return m

    # static interaction
    dimtot = dim_site**n
    H_int = np.zeros((dimtot, dimtot), dtype=complex)
    if basis_name in ("ground-rydberg", "all") and n > 1:
        n_op = op("rr")
        for i in range(n):
            for j in range(i + 1, n):
                r = np.linalg.norm(coords[qids[i]] - coords[qids[j]])
                U = device.interaction_coeff / r**6
                H_int += U * _lift(n_op, i, n, dim_site) @ _lift(
                    n_op, j, n, dim_site
                )
    elif basis_name == "XY" and n > 1:
        mag = np.asarray(ss._magnetic_field[: coords[qids[0]].shape[0]])
        for i in range(n):
            for j in range(i + 1, n):
                dv = coords[qids[i]] - coords[qids[j]]
                r = np.linalg.norm(dv)
                mn = np.linalg.norm(mag)
                cosine = 0.0 if mn < 1e-8 else float(dv @ mag) / (r * mn)
                U = device.interaction_coeff_xy * (1 - 3 * cosine**2) / r**3
                t1 = _lift(op("ud"), i, n, dim_site) @ _lift(op("du"), j, n, dim_site)
                H_int += U * (t1 + t1.conj().T)

    # per-basis drive ops
    drive = []
    for basis, qd in per_qubit.items():
        if basis == "ground-rydberg":
            a_op, d_op = op("gr"), op("rr")
        elif basis == "digital":
            a_op, d_op = op("hg"), op("gg")
        else:
            a_op, d_op = op("du"), op("uu")
        for q, s_ in qd.items():
            i = qids.index(q)
            # the model convention (shared with the reference,
            # hamiltonian.py:421+526): build the combined complex coeff
            # 0.5 * amp * exp(-i phase) per ns, interpolate THAT linearly
            camp = 0.5 * s_["amp"] * np.exp(-1j * s_["phase"])
            drive.append((i, a_op, d_op, camp, s_["det"]))

    tgrid = np.arange(T) / 1000.0

    def H(t):
        out = H_int.copy()
        for i, a_op, d_op, camp, det in drive:
            c = np.interp(t, tgrid, camp.real) + 1j * np.interp(
                t, tgrid, camp.imag
            )
            d_ = np.interp(t, tgrid, det)
            la = _lift(a_op, i, n, dim_site)
            out += c * la + np.conj(c) * la.conj().T
            out += -d_ * _lift(d_op, i, n, dim_site)
        return out

    gidx_site = labels.index("u" if basis_name == "XY" else "g")
    gidx = 0
    for _ in range(n):
        gidx = gidx * dim_site + gidx_site
    return H, dimtot, T, gidx


def golden_sesolve(seq, device, eval_times_us, psi0=None, coords_override=None):
    """scipy DOP853 integration of the Schrodinger equation."""
    H, dimtot, T, gidx = golden_h_of_t(seq, device, coords_override)
    if psi0 is None:
        psi0 = np.zeros(dimtot, dtype=complex)
        psi0[gidx] = 1.0

    def rhs(t, y):
        return -1j * (H(t) @ y)

    sol = solve_ivp(
        rhs,
        (0.0, float(max(eval_times_us))),
        psi0,
        t_eval=np.asarray(eval_times_us, dtype=float),
        method="DOP853",
        rtol=1e-11,
        atol=1e-13,
    )
    return sol.y.T  # (n_eval, dim)


def golden_mesolve(
    seq, device, eval_times_us, collapse_ops, psi0=None, coords_override=None
):
    """scipy integration of the Lindblad equation with dense collapse ops."""
    H, dimtot, T, gidx = golden_h_of_t(seq, device, coords_override)
    if psi0 is None:
        psi0 = np.zeros(dimtot, dtype=complex)
        psi0[gidx] = 1.0
    rho0 = np.outer(psi0, psi0.conj())

    Ls = [np.asarray(L, dtype=complex) for L in collapse_ops]
    LdL = [L.conj().T @ L for L in Ls]

    def rhs(t, y):
        rho = y.reshape(dimtot, dimtot)
        Ht = H(t)
        out = -1j * (Ht @ rho - rho @ Ht)
        for L, M in zip(Ls, LdL):
            out += L @ rho @ L.conj().T - 0.5 * (M @ rho + rho @ M)
        return out.reshape(-1)

    sol = solve_ivp(
        rhs,
        (0.0, float(max(eval_times_us))),
        rho0.reshape(-1),
        t_eval=np.asarray(eval_times_us, dtype=float),
        method="DOP853",
        rtol=1e-10,
        atol=1e-12,
    )
    return sol.y.T.reshape(len(eval_times_us), dimtot, dimtot)
