"""Batched-realization U(1) DMRG: many instances, one compiled sweep.

The chi=1024 x 1k-disorder-realizations configuration (SURVEY §7.7,
BASELINE.md) executed the TPU way: every realization shares one charge
skeleton (:func:`tensornetwork_tpu.blocksparse.batched.uniform_skeleton_mps`),
so the whole per-site step — Lanczos local solve, completed-polar gauge
shift, bond-factor absorption, environment growth — runs on-device as
batched sector GEMMs, vmapped over the realization axis.  One jitted
program per (site, direction) serves every realization and sweep.

The reference has no batched symmetric execution at all: realizations
run serially through python sector loops
(reference ``block_sparse/blocksparsetensor.py:1094``, per-instance
scipy Lanczos ``backends/symmetric/symmetric_backend.py:291``).

MPO disorder: pass ``mpos`` as a list of per-realization MPO tensor
lists with IDENTICAL charge structure (e.g. different couplings in the
XXZ W-tensors); their data stacks on the batch axis like the MPS data.
A single shared MPO is broadcast.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensornetwork_tpu.blocksparse.batched import (
    ShiftPlan, contraction_plan, random_data_batch, uniform_skeleton_mps)
from tensornetwork_tpu.blocksparse.charge import U1Charge
from tensornetwork_tpu.blocksparse.index import Index
from tensornetwork_tpu.blocksparse.initialization import zeros
from tensornetwork_tpu.blocksparse.tensor import BlockSparseTensor, tensordot
from tensornetwork_tpu.ops import krylov

Array = jax.Array


def _trivial_skel(flow: bool, dtype) -> BlockSparseTensor:
    return zeros([Index(U1Charge(np.array([0])), flow)], dtype=dtype)


def _boundary_left_skel(dtype) -> BlockSparseTensor:
    t = zeros([Index(U1Charge(np.array([0])), True),
               Index(U1Charge(np.array([0])), True),
               Index(U1Charge(np.array([0])), False)], dtype=dtype)
    return t


def _boundary_right_skel(last_bond, dtype) -> BlockSparseTensor:
    return zeros([Index(last_bond.copy(), False),
                  Index(U1Charge(np.array([0])), False),
                  Index(last_bond.copy(), True)], dtype=dtype)


class _SiteProgram:
    """Compiled per-(site, direction) batched step.

    ``ep_mesh``: a mesh whose ``ep_axis`` shards the charge *sectors* of
    every contraction in the step (EP-analog, SURVEY §2.10.2, VERDICT r2
    item 2): the whole step body runs under one ``shard_map``, each
    contraction executes its per-device sector slice and reassembles the
    (disjoint-region) output with one ``psum``; the small per-bond gauge
    solves run replicated (they are latency-, not FLOP-bound)."""

    def __init__(self, A_skel, A_next_skel, W_skel, L_skel, R_skel,
                 direction: str, num_krylov_vecs: int, ritz_method: str,
                 reorth: bool = True, ep_mesh=None, ep_axis: str = "ep",
                 ep_capacity: bool = False):
        self.direction = direction
        self.m = num_krylov_vecs
        ep = (None if ep_mesh is None
              else (ep_mesh.shape[ep_axis], ep_axis))
        if ep_capacity and ep is None:
            raise ValueError("ep_capacity requires ep_mesh")
        # matvec chain plans (single instance; vmapped by the jit below).
        # EP runs the whole chain FUSED: sectors partitioned by
        # dependency component, ONE final psum per matvec instead of a
        # full-intermediate psum per contraction (VERDICT r3 item 2)
        if ep is None:
            self.mv1, t1 = contraction_plan(L_skel, A_skel, [[0], [0]])
            self.mv2, t2 = contraction_plan(t1, W_skel, [[0, 2], [0, 3]])
            self.mv3, y_skel = contraction_plan(t2, R_skel,
                                                [[1, 2], [0, 1]])
        else:
            from tensornetwork_tpu.blocksparse.batched import (
                chain_contraction_plan)
            self.mv_chain, y_skel = chain_contraction_plan(
                [(L_skel, A_skel, [[0], [0]]),
                 (None, W_skel, [[0, 2], [0, 3]]),
                 (None, R_skel, [[1, 2], [0, 1]])], ep=ep)
        if y_skel.data.shape != A_skel.data.shape:
            raise AssertionError("matvec output layout mismatch")
        self.shift = ShiftPlan(A_skel, direction)
        bond_skel = self.shift.bond_skel
        # capacity-EP runs the tiny bond-factor absorption REPLICATED:
        # its operands are replicated anyway, so the per-contraction EP
        # executor's x-sized psum is pure comm for no capacity gain
        ep_abs = None if ep_capacity else ep
        if direction == "right":
            # absorb P into the next site from the left: P·A_next
            self.absorb, abs_out = contraction_plan(
                bond_skel, A_next_skel, [[1], [0]], ep=ep_abs)
        else:
            # absorb P into the previous site from the right: A_prev·P
            self.absorb, abs_out = contraction_plan(
                A_next_skel, bond_skel, [[2], [0]], ep=ep_abs)
        if direction == "right":
            grow_stages = [(L_skel, A_skel, [[0], [0]]),
                           (None, W_skel, [[0, 2], [0, 3]]),
                           # conj flips all flows (metadata-only for real
                           # data; layout is invariant under a global
                           # flow flip)
                           (None, A_skel.conj(), [[0, 3], [0, 1]])]
        else:
            grow_stages = [(A_skel, R_skel, [[2], [0]]),
                           (None, W_skel, [[1, 2], [3, 1]]),
                           (None, A_skel.conj(), [[1, 3], [2, 1]])]
        if ep is None:
            self.g1, e1 = contraction_plan(*grow_stages[0][:2],
                                           grow_stages[0][2])
            self.g2, e2 = contraction_plan(e1, grow_stages[1][1],
                                           grow_stages[1][2])
            self.g3, self.env_out_skel = contraction_plan(
                e2, grow_stages[2][1], grow_stages[2][2])
        else:
            # capacity-EP: env-growth chains emit NO psum — the
            # disjoint-support partials reduce-scatter straight into
            # the sharded env storage (see blocksparse.batched
            # capacity-EP note)
            self.g_chain, self.env_out_skel = chain_contraction_plan(
                grow_stages, ep=ep,
                reduce="none" if ep_capacity else "psum")
        if abs_out.data.shape != A_next_skel.data.shape:
            raise AssertionError("absorb output layout mismatch")
        ritz = ritz_method

        def step(dA, dA_next, dW, dL, dR):
            # the contraction executors force highest internally, but the
            # gauge polar iterations, Lanczos recurrence dots and norms
            # here would otherwise run at DEFAULT precision — on TPU that
            # is the documented non-variational-energy trap (BASELINE.md
            # gauge-precision A/B; observed live: N=6 chi=16 XXZ sweeps
            # converge BELOW the exact ground state without this wrap)
            with jax.default_matmul_precision("highest"):
                return _step_body(dA, dA_next, dW, dL, dR)

        def _step_body(dA, dA_next, dW, dL, dR):
            def solve(da, dw, dl, dr):
                if ep is None:
                    mv = lambda x: self.mv3(
                        self.mv2(self.mv1(dl, x), dw), dr)
                else:
                    mv = lambda x: self.mv_chain(dl, x, dw, dr)
                evals, evecs = krylov.eigsh_lanczos(
                    mv, da, num_krylov_vecs=self.m, numeig=1,
                    ritz_method=ritz, reorthogonalize=reorth)
                return evals[0], evecs[0]

            es, vs = jax.vmap(solve)(dA, dW, dL, dR)
            qd, pd = self.shift(vs)
            if direction == "right":
                dA_next2 = jax.vmap(self.absorb)(pd, dA_next)
            else:
                dA_next2 = jax.vmap(self.absorb)(dA_next, pd)
            nrm = jnp.linalg.norm(dA_next2, axis=-1, keepdims=True)
            dA_next2 = dA_next2 / jnp.where(nrm > 0, nrm, 1.0)

            def grow(dq, dw, denv):
                if ep is not None:
                    if direction == "right":
                        return self.g_chain(denv, dq, dw, dq)
                    return self.g_chain(dq, denv, dw, dq)
                if direction == "right":
                    return self.g3(self.g2(self.g1(denv, dq), dw), dq)
                return self.g3(self.g2(self.g1(dq, denv), dw), dq)

            denv_new = jax.vmap(grow)(qd, dW, dL if direction == "right"
                                      else dR)
            return es, qd, dA_next2, denv_new

        if ep_mesh is None:
            self._step = jax.jit(step)
        elif not ep_capacity:
            from jax.sharding import PartitionSpec as P
            self._step = jax.jit(jax.shard_map(
                step, mesh=ep_mesh,
                in_specs=(P(), P(), P(), P(), P()),
                out_specs=(P(), P(), P(), P()),
                check_vma=False))
        else:
            from jax.sharding import PartitionSpec as P
            from tensornetwork_tpu.blocksparse.batched import (
                env_gather_full, env_scatter_stored)
            ndev, axis = ep
            nnzL, nnzR = L_skel.data.size, R_skel.data.size

            def step_cap(dA, dA_next, dW, dLs, dRs):
                # envs arrive in sharded storage layout (B, 1, L-block
                # per device): gather the current bond's envs
                # transiently, run the step, reduce-scatter the new
                # env's disjoint-support partial back into storage
                dL = env_gather_full(dLs[:, 0], nnzL, axis)
                dR = env_gather_full(dRs[:, 0], nnzR, axis)
                es, qd, nxt, denv_partial = step(dA, dA_next, dW, dL, dR)
                stored = env_scatter_stored(denv_partial, ndev, axis)
                return es, qd, nxt, stored[:, None, :]

            self._step = jax.jit(jax.shard_map(
                step_cap, mesh=ep_mesh,
                in_specs=(P(), P(), P(), P(None, ep_axis, None),
                          P(None, ep_axis, None)),
                out_specs=(P(), P(), P(), P(None, ep_axis, None)),
                check_vma=False))

    def __call__(self, dA, dA_next, dW, dL, dR):
        return self._step(dA, dA_next, dW, dL, dR)


class BatchedSymmetricDMRG:
    """One-site DMRG over a batch of U(1) realizations on one device.

    Parameters
    ----------
    skeleton:   list of N skeleton tensors (shared charge structure),
                e.g. from :func:`uniform_skeleton_mps`.
    data:       list of N (B, nnz_i) data stacks.
    mpo:        list of N BlockSparseTensor MPO tensors (legs
                wl, wr, s_out, s_in as in
                :func:`tensornetwork_tpu.models.symmetric_dmrg.u1_xxz_mpo`).
    mpo_data:   optional list of N (B, nnz_w) stacks for per-realization
                MPO disorder (same charge structure); default broadcasts
                the shared MPO data.
    """

    def __init__(self, skeleton: Sequence[BlockSparseTensor],
                 data: Sequence[Array],
                 mpo: Sequence[BlockSparseTensor],
                 mpo_data: Optional[Sequence[Array]] = None,
                 num_krylov_vecs: int = 10,
                 ritz_method: str = "power",
                 reorth: bool = True,
                 mesh=None, batch_axis: str = "data",
                 ep_mesh=None, ep_axis: str = "ep",
                 ep_capacity: bool = False):
        if len(skeleton) != len(mpo):
            raise ValueError("MPS and MPO must have equal length")
        if mesh is not None and ep_mesh is not None:
            raise ValueError(
                "pass either mesh= (batch/DP sharding) or ep_mesh= "
                "(sector/EP sharding), not both")
        if ep_capacity and ep_mesh is None:
            raise ValueError("ep_capacity=True requires ep_mesh")
        self.ep_mesh = ep_mesh
        self.ep_axis = ep_axis
        # capacity-EP (VERDICT r4 item 1): store every environment
        # between programs in the (B, ndev, L) sharded layout — per-
        # device env HBM = nnz/ndev — with env-growth chains reduce-
        # scattering (no psum) and consumers all-gathering transiently.
        # See blocksparse.batched capacity-EP note for the design.
        self.ep_capacity = bool(ep_capacity)
        self._env_sharding = None
        if ep_capacity:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._env_sharding = NamedSharding(
                ep_mesh, P(None, ep_axis, None))
        self.skeleton = list(skeleton)
        self.data = list(data)
        self.mpo = list(mpo)
        self.N = len(skeleton)
        self.B = int(data[0].shape[0])
        self.m = num_krylov_vecs
        self.ritz = ritz_method
        self.reorth = reorth
        if mpo_data is None:
            mpo_data = [jnp.broadcast_to(jnp.asarray(w.data),
                                         (self.B,) + w.data.shape)
                        for w in mpo]
        self.mpo_data = list(mpo_data)
        # environment stacks inherit the promoted dtype of the growth
        # chain (data x mpo); boundary envs and AOT export specs must
        # agree with it
        self._env_dtype = jnp.result_type(self.data[0].dtype,
                                          self.mpo_data[0].dtype)
        # data parallelism over realizations: shard the batch axis of
        # every data stack across the mesh; the sweep contains no
        # cross-instance term, so XLA inserts no collectives at all
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._batch_sharding = NamedSharding(mesh, P(batch_axis, None))
            self.data = [jax.device_put(d, self._batch_sharding)
                         for d in self.data]
            self.mpo_data = [jax.device_put(d, self._batch_sharding)
                             for d in self.mpo_data]
        dtype = skeleton[0].dtype
        self._Lskel: List[BlockSparseTensor] = [None] * (self.N + 1)
        self._Rskel: List[BlockSparseTensor] = [None] * (self.N + 1)
        self._Lskel[0] = _boundary_left_skel(dtype)
        self._Rskel[self.N] = _boundary_right_skel(
            skeleton[-1].flat_charges[-1], dtype)
        # environment skeletons via the host numpy engine on zero data
        from tensornetwork_tpu.models.symmetric_dmrg import (
            _add_left, _add_right)
        for k in range(self.N):
            self._Lskel[k + 1] = _add_left(self._Lskel[k], skeleton[k],
                                           mpo[k])
        for k in range(self.N - 1, -1, -1):
            self._Rskel[k] = _add_right(self._Rskel[k + 1], skeleton[k],
                                        mpo[k])
        self._programs: Dict[Tuple[int, str], _SiteProgram] = {}
        self._canon_programs: Dict[int, Tuple] = {}
        self.energies: List[np.ndarray] = []

    # -- initial right-canonicalization + right environments ---------------
    def _canon_key(self, site: int):
        # reuse compiled canonicalization programs across sites with the
        # same charge structure
        from tensornetwork_tpu.blocksparse.jax_engine import _structure_key
        sig = (_structure_key(self.skeleton[site]),
               _structure_key(self.skeleton[site - 1]),
               _structure_key(self.mpo[site]),
               _structure_key(self._Rskel[site + 1]))
        if not hasattr(self, "_canon_sig_map"):
            self._canon_sig_map = {}
        return self._canon_sig_map.setdefault(sig, site)

    def _canon_program(self, site: int):
        site = self._canon_key(site)
        if site not in self._canon_programs:
            A_skel = self.skeleton[site]
            A_prev_skel = self.skeleton[site - 1]
            ep = (None if self.ep_mesh is None
                  else (self.ep_mesh.shape[self.ep_axis], self.ep_axis))
            shift = ShiftPlan(A_skel, "left")
            # replicated absorb under capacity-EP — see _SiteProgram
            absorb, abs_out = contraction_plan(
                A_prev_skel, shift.bond_skel, [[2], [0]],
                ep=None if self.ep_capacity else ep)
            if abs_out.data.shape != A_prev_skel.data.shape:
                raise AssertionError("canon absorb layout mismatch")
            grow_stages = [(A_skel, self._Rskel[site + 1], [[2], [0]]),
                           (None, self.mpo[site], [[1, 2], [3, 1]]),
                           (None, A_skel.conj(), [[1, 3], [2, 1]])]
            if ep is None:
                g1, e1 = contraction_plan(*grow_stages[0][:2],
                                          grow_stages[0][2])
                g2, e2 = contraction_plan(e1, grow_stages[1][1],
                                          grow_stages[1][2])
                g3, env_out = contraction_plan(e2, grow_stages[2][1],
                                               grow_stages[2][2])
            else:
                from tensornetwork_tpu.blocksparse.batched import (
                    chain_contraction_plan)
                g_chain, _ = chain_contraction_plan(
                    grow_stages, ep=ep,
                    reduce="none" if self.ep_capacity else "psum")

            def run(dA, dA_prev, dW, dR):
                # gauge polar precision trap — see _SiteProgram.step
                with jax.default_matmul_precision("highest"):
                    qd, pd = shift(dA)
                    dA_prev2 = jax.vmap(absorb)(dA_prev, pd)
                    nrm = jnp.linalg.norm(dA_prev2, axis=-1,
                                          keepdims=True)
                    dA_prev2 = dA_prev2 / jnp.where(nrm > 0, nrm, 1.0)

                    def grow(dq, dw, dr):
                        if ep is not None:
                            return g_chain(dq, dr, dw, dq)
                        return g3(g2(g1(dq, dr), dw), dq)

                    dR_new = jax.vmap(grow)(qd, dW, dR)
                    return qd, dA_prev2, dR_new

            if self.ep_mesh is None:
                run_c = jax.jit(run)
            elif not self.ep_capacity:
                from jax.sharding import PartitionSpec as P
                run_c = jax.jit(jax.shard_map(
                    run, mesh=self.ep_mesh,
                    in_specs=(P(), P(), P(), P()),
                    out_specs=(P(), P(), P()),
                    check_vma=False))
            else:
                from jax.sharding import PartitionSpec as P
                from tensornetwork_tpu.blocksparse.batched import (
                    env_gather_full, env_scatter_stored)
                ndev = ep[0]
                nnzR = self._Rskel[site + 1].data.size

                def run_cap(dA, dA_prev, dW, dRs):
                    dR = env_gather_full(dRs[:, 0], nnzR, self.ep_axis)
                    qd, prev2, dR_partial = run(dA, dA_prev, dW, dR)
                    stored = env_scatter_stored(dR_partial, ndev,
                                                self.ep_axis)
                    return qd, prev2, stored[:, None, :]

                run_c = jax.jit(jax.shard_map(
                    run_cap, mesh=self.ep_mesh,
                    in_specs=(P(), P(), P(), P(None, self.ep_axis, None)),
                    out_specs=(P(), P(), P(None, self.ep_axis, None)),
                    check_vma=False))
            self._canon_programs[site] = run_c
        return self._canon_programs[site]

    def _structure_sig(self, *tensors):
        from tensornetwork_tpu.blocksparse.jax_engine import _structure_key
        return tuple(_structure_key(t) for t in tensors)

    def _program(self, site: int, direction: str) -> _SiteProgram:
        # key on the charge STRUCTURE, not the site index: bulk sites of
        # a smooth bond profile share structures, so one compiled program
        # serves several sites (cuts the ~45-program first-sweep compile)
        nxt = site + 1 if direction == "right" else site - 1
        key = (direction, self._structure_sig(
            self.skeleton[site], self.skeleton[nxt], self.mpo[site],
            self._Lskel[site], self._Rskel[site + 1]))
        if key not in self._programs:
            self._programs[key] = _SiteProgram(
                self.skeleton[site], self.skeleton[nxt], self.mpo[site],
                self._Lskel[site], self._Rskel[site + 1], direction,
                self.m, self.ritz, self.reorth,
                ep_mesh=self.ep_mesh, ep_axis=self.ep_axis,
                ep_capacity=self.ep_capacity)
        return self._programs[key]

    def precompile(self, max_workers: int = 8, verbose: int = 0) -> float:
        """Build and compile every per-(site, direction) program for the
        one-site sweep *concurrently* (VERDICT r1 item 6: the cold
        first-sweep compile wall).  Tracing is Python/GIL-bound and runs
        sequentially; the XLA compiles release the GIL and overlap in a
        thread pool (the remote TPU compile service parallelizes across
        requests).  Returns the wall time spent."""
        import concurrent.futures as cf
        import time as _time
        if self._batch_sharding is not None or self.ep_mesh is not None:
            # AOT-compiled executables pin input shardings; the sharded
            # paths keep the lazy jit cache
            return 0.0
        t0 = _time.perf_counter()
        dtype = self.data[0].dtype

        def sds(skel):
            return jax.ShapeDtypeStruct((self.B, skel.data.shape[0]),
                                        dtype)

        def sds_env(skel):
            return jax.ShapeDtypeStruct((self.B, skel.data.shape[0]),
                                        self._env_dtype)

        def sds_w(site):
            return jax.ShapeDtypeStruct(self.mpo_data[site].shape,
                                        self.mpo_data[site].dtype)

        lowered = []
        for site in range(self.N - 1, 0, -1):
            run = self._canon_program(site)
            if hasattr(run, "lower"):          # skip already-compiled
                lowered.append((("canon", self._canon_key(site)),
                                run.lower(
                    sds(self.skeleton[site]), sds(self.skeleton[site - 1]),
                    sds_w(site), sds_env(self._Rskel[site + 1]))))
        for direction, sites in (("right", range(self.N - 1)),
                                 ("left", range(self.N - 1, 0, -1))):
            for site in sites:
                nxt = site + 1 if direction == "right" else site - 1
                prog = self._program(site, direction)
                if not hasattr(prog._step, "lower"):
                    continue
                lowered.append(((prog, None), prog._step.lower(
                    sds(self.skeleton[site]), sds(self.skeleton[nxt]),
                    sds_w(site), sds_env(self._Lskel[site]),
                    sds_env(self._Rskel[site + 1]))))
        t_trace = _time.perf_counter() - t0
        # dedupe: _program/_canon_program already share instances across
        # sites with equal charge structure, so each entry is unique
        with cf.ThreadPoolExecutor(max_workers=max_workers) as pool:
            futs = [(target, pool.submit(low.compile))
                    for target, low in lowered]
            for (target, fut) in futs:
                compiled = fut.result()
                if isinstance(target, tuple) and target[0] == "canon":
                    self._canon_programs[target[1]] = compiled
                else:
                    target[0]._step = compiled
        dt = _time.perf_counter() - t0
        if verbose:
            print(f"precompile: {len(lowered)} programs in {dt:.1f}s "
                  f"(trace {t_trace:.1f}s)")
        return dt

    # -- serialized-trace AOT artifacts (VERDICT r2 item 3) -----------------
    # The cold compile wall at chi=1024 N=16 is TRACING-dominated (121 s,
    # Python/GIL-bound, sequential; BASELINE.md) — compile parallelism
    # cannot cut it.  jax.export serializes the traced StableHLO per
    # program; a second process deserializes instead of retracing, and the
    # persistent XLA compilation cache supplies the compiled binaries, so
    # the second-process cold start skips BOTH walls.

    def _export_sig(self, kind: str, sig) -> str:
        import hashlib
        payload = repr((jax.__version__, kind, sig, self.B,
                        str(jnp.dtype(self.data[0].dtype)),
                        str(jnp.dtype(self.mpo_data[0].dtype)), self.m,
                        self.ritz, self.reorth))
        return hashlib.sha256(payload.encode()).hexdigest()[:24]

    def _canon_sig(self, site: int):
        from tensornetwork_tpu.blocksparse.jax_engine import _structure_key
        return (_structure_key(self.skeleton[site]),
                _structure_key(self.skeleton[site - 1]),
                _structure_key(self.mpo[site]),
                _structure_key(self._Rskel[site + 1]))

    def _iter_program_keys(self):
        """(kind, stable-sig, builder args) for every one-site program."""
        seen = set()
        for site in range(self.N - 1, 0, -1):
            sig = ("canon", self._canon_sig(site))
            if sig not in seen:
                seen.add(sig)
                yield ("canon", sig, site)
        for direction, sites in (("right", range(self.N - 1)),
                                 ("left", range(self.N - 1, 0, -1))):
            for site in sites:
                nxt = site + 1 if direction == "right" else site - 1
                sig = (direction, self._structure_sig(
                    self.skeleton[site], self.skeleton[nxt],
                    self.mpo[site], self._Lskel[site],
                    self._Rskel[site + 1]))
                if sig not in seen:
                    seen.add(sig)
                    yield ("site", sig, (site, direction))

    def export_programs(self, path: str, verbose: int = 0,
                        subset: Optional[Sequence[int]] = None,
                        platforms: Optional[Sequence[str]] = None) -> int:
        """Serialize every one-site program's traced StableHLO to
        ``path`` (one file per unique charge-structure program, named by
        a hash of the structure + batch/dtype/solver config).  Call
        before :meth:`precompile` (exports need the jitted, not the
        AOT-compiled, callables).  Returns the number written.

        ``subset``: indices into the stable program-key enumeration —
        used by :meth:`export_programs_parallel` to partition work
        across processes.  ``platforms``: target platform list for
        cross-platform export (e.g. ``("tpu",)`` from a CPU-backed
        worker process — tracing is pure host work, so workers need no
        device access)."""
        import os
        from jax import export as jexport
        if self.ep_mesh is not None or self._batch_sharding is not None:
            raise ValueError("export is for the single-device path")
        os.makedirs(path, exist_ok=True)
        dtype = self.data[0].dtype
        plat = None if platforms is None else list(platforms)

        def sds(skel):
            return jax.ShapeDtypeStruct((self.B, skel.data.shape[0]),
                                        dtype)

        def sds_env(skel):
            return jax.ShapeDtypeStruct((self.B, skel.data.shape[0]),
                                        self._env_dtype)

        n = 0
        for idx, (kind, sig, ref) in enumerate(self._iter_program_keys()):
            if subset is not None and idx not in subset:
                continue
            fname = os.path.join(path, self._export_sig(kind, sig) + ".shlo")
            if os.path.exists(fname):
                continue
            if kind == "canon":
                site = ref
                run = self._canon_program(site)
                if not hasattr(run, "lower"):
                    continue
                exp = jexport.export(run, platforms=plat)(
                    sds(self.skeleton[site]), sds(self.skeleton[site - 1]),
                    jax.ShapeDtypeStruct(self.mpo_data[site].shape,
                                         self.mpo_data[site].dtype),
                    sds_env(self._Rskel[site + 1]))
            else:
                site, direction = ref
                nxt = site + 1 if direction == "right" else site - 1
                prog = self._program(site, direction)
                if not hasattr(prog._step, "lower"):
                    continue
                exp = jexport.export(prog._step, platforms=plat)(
                    sds(self.skeleton[site]), sds(self.skeleton[nxt]),
                    jax.ShapeDtypeStruct(self.mpo_data[site].shape,
                                         self.mpo_data[site].dtype),
                    sds_env(self._Lskel[site]),
                    sds_env(self._Rskel[site + 1]))
            tmp = fname + ".tmp"
            with open(tmp, "wb") as f:
                f.write(exp.serialize())
            os.replace(tmp, fname)
            n += 1
            if verbose:
                print(f"exported {kind} program -> {fname}")
        return n

    def _worker_spec(self):
        """Picklable reconstruction spec for export workers (data values
        are irrelevant to tracing — workers rebuild with zeros)."""
        return dict(
            skeleton=self.skeleton, mpo=self.mpo, B=self.B,
            data_dtype=str(jnp.dtype(self.data[0].dtype)),
            mpo_dtype=str(jnp.dtype(self.mpo_data[0].dtype)),
            m=self.m, ritz=self.ritz, reorth=self.reorth)

    def export_programs_parallel(self, path: str, workers: int = 2,
                                 verbose: int = 0,
                                 platforms: Optional[Sequence[str]] = None
                                 ) -> int:
        """Fan the export across ``workers`` PROCESSES (VERDICT r3 item
        7: tracing is Python/GIL-bound, so threads cannot cut the 137 s
        sequential trace wall — the 45 programs are independent).  Each
        worker reconstructs the solver from a pickled spec on the CPU
        backend (no device contention) and exports its index-stride
        slice cross-platform for this process's backend.  Returns the
        total number of artifacts written."""
        import multiprocessing as mp
        if platforms is None:
            platforms = (jax.default_backend(),)
        keys = list(self._iter_program_keys())
        missing = []
        import os
        for idx, (kind, sig, _) in enumerate(keys):
            fname = os.path.join(path,
                                 self._export_sig(kind, sig) + ".shlo")
            if not os.path.exists(fname):
                missing.append(idx)
        if not missing:
            return 0
        workers = max(1, min(workers, len(missing)))
        if workers == 1:
            return self.export_programs(path, verbose=verbose,
                                        subset=set(missing),
                                        platforms=platforms)
        spec = self._worker_spec()
        subsets = [set(missing[i::workers]) for i in range(workers)]
        ctx = mp.get_context("spawn")
        procs = [ctx.Process(target=_export_worker,
                             args=(spec, path, sub, tuple(platforms)))
                 for sub in subsets]
        for p in procs:
            p.start()
        n = 0
        for p in procs:
            p.join()
            if p.exitcode != 0:
                raise RuntimeError(
                    f"export worker failed (exit {p.exitcode})")
        for idx in missing:
            kind, sig, _ = keys[idx]
            fname = os.path.join(path,
                                 self._export_sig(kind, sig) + ".shlo")
            n += int(os.path.exists(fname))
        if verbose:
            print(f"parallel export: {n}/{len(missing)} programs via "
                  f"{workers} workers")
        return n

    def load_programs(self, path: str, verbose: int = 0) -> int:
        """Install serialized traces from ``path`` (written by
        :meth:`export_programs`, possibly by another process): matching
        programs skip tracing entirely — their first call deserializes
        StableHLO and goes straight to XLA compilation (served by the
        persistent compilation cache when enabled).  Returns the number
        of programs installed."""
        import os
        from jax import export as jexport

        class _Loaded:
            def __init__(self, call):
                self._step = call

            def __call__(self, *args):
                return self._step(*args)

        n = 0
        for kind, sig, ref in self._iter_program_keys():
            fname = os.path.join(path, self._export_sig(kind, sig) + ".shlo")
            if not os.path.exists(fname):
                continue
            with open(fname, "rb") as f:
                exp = jexport.deserialize(f.read())
            call = jax.jit(exp.call)
            if kind == "canon":
                self._canon_programs[self._canon_key(ref)] = call
            else:
                site, direction = ref
                nxt = site + 1 if direction == "right" else site - 1
                key = (direction, self._structure_sig(
                    self.skeleton[site], self.skeleton[nxt],
                    self.mpo[site], self._Lskel[site],
                    self._Rskel[site + 1]))
                self._programs[key] = _Loaded(call)
            n += 1
            if verbose:
                print(f"loaded {kind} program <- {fname}")
        return n

    def _boundary_env(self) -> Array:
        """The trivial (B, 1) boundary env, in the storage layout the
        active parallel mode expects (sharded (B, ndev, 1) blocks under
        capacity-EP)."""
        e = jnp.ones((self.B, 1), self._env_dtype)
        if self._batch_sharding is not None:
            return jax.device_put(e, self._batch_sharding)
        if self.ep_capacity:
            from tensornetwork_tpu.blocksparse.batched import env_to_stored
            ndev = self.ep_mesh.shape[self.ep_axis]
            return jax.device_put(env_to_stored(e, ndev),
                                  self._env_sharding)
        return e

    def run_one_site(self, num_sweeps: int = 4, tol: float = 1e-10,
                     verbose: int = 0) -> np.ndarray:
        """Returns the per-realization energies (B,) of the last sweep."""
        # right-canonicalize and build right envs
        Rdata: List[Array] = [None] * (self.N + 1)
        Rdata[self.N] = self._boundary_env()
        for site in range(self.N - 1, 0, -1):
            run = self._canon_program(site)
            qd, prev2, rnew = run(self.data[site], self.data[site - 1],
                                  self.mpo_data[site], Rdata[site + 1])
            self.data[site] = qd
            self.data[site - 1] = prev2
            Rdata[site] = rnew
        e_prev = None
        es = None
        for sweep in range(num_sweeps):
            Ldata: List[Array] = [None] * (self.N + 1)
            Ldata[0] = self._boundary_env()
            for site in range(self.N - 1):
                prog = self._program(site, "right")
                es, qd, nxt, lnew = prog(
                    self.data[site], self.data[site + 1],
                    self.mpo_data[site], Ldata[site], Rdata[site + 1])
                self.data[site] = qd
                self.data[site + 1] = nxt
                Ldata[site + 1] = lnew
            for site in range(self.N - 1, 0, -1):
                prog = self._program(site, "left")
                es, qd, prv, rnew = prog(
                    self.data[site], self.data[site - 1],
                    self.mpo_data[site], Ldata[site], Rdata[site + 1])
                self.data[site] = qd
                self.data[site - 1] = prv
                Rdata[site] = rnew
            es = np.asarray(jax.device_get(es))
            self.energies.append(es)
            if verbose:
                print(f"sweep {sweep}: E mean {es.mean():.10f} "
                      f"span [{es.min():.8f}, {es.max():.8f}]")
            e_mean = float(es.mean())
            if e_prev is not None and abs(e_mean - e_prev) < tol:
                break
            e_prev = e_mean
        return es


class _BondProgram:
    """Compiled per-(bond, direction) batched two-site step."""

    def __init__(self, A_skel, B_skel, W1_skel, W2_skel, L_skel, R_skel,
                 direction: str, num_krylov_vecs: int, ritz_method: str,
                 reorth: bool = True, ep_mesh=None, ep_axis: str = "ep",
                 ep_capacity: bool = False):
        from tensornetwork_tpu.blocksparse.batched import TwoSiteSplitPlan
        self.direction = direction
        self.m = num_krylov_vecs
        ep = (None if ep_mesh is None
              else (ep_mesh.shape[ep_axis], ep_axis))
        if ep_capacity and ep is None:
            raise ValueError("ep_capacity requires ep_mesh")
        # replicated theta assembly under capacity-EP (operands are
        # replicated; avoids the per-contraction executor's psum)
        self.theta, theta_skel = contraction_plan(
            A_skel, B_skel, [[2], [0]],
            ep=None if ep_capacity else ep)
        # two-site effective-H matvec chain on theta (l, s, t, r).
        # EP: fused chain, ONE theta-sized psum per matvec instead of a
        # full-intermediate psum per contraction (VERDICT r3 item 2)
        if ep is None:
            self.mv1, t1 = contraction_plan(L_skel, theta_skel,
                                            [[0], [0]])
            self.mv2, t2 = contraction_plan(t1, W1_skel, [[0, 2], [0, 3]])
            self.mv3, t3 = contraction_plan(t2, W2_skel, [[3, 1], [0, 3]])
            self.mv4, y_skel = contraction_plan(t3, R_skel,
                                                [[1, 3], [0, 1]])
        else:
            from tensornetwork_tpu.blocksparse.batched import (
                chain_contraction_plan)
            self.mv_chain, y_skel = chain_contraction_plan(
                [(L_skel, theta_skel, [[0], [0]]),
                 (None, W1_skel, [[0, 2], [0, 3]]),
                 (None, W2_skel, [[3, 1], [0, 3]]),
                 (None, R_skel, [[1, 3], [0, 1]])], ep=ep)
        if y_skel.data.shape != theta_skel.data.shape:
            raise AssertionError("2s matvec output layout mismatch")
        self.split = TwoSiteSplitPlan(theta_skel, A_skel, B_skel)
        if direction == "right":
            grow_stages = [(L_skel, A_skel, [[0], [0]]),
                           (None, W1_skel, [[0, 2], [0, 3]]),
                           (None, A_skel.conj(), [[0, 3], [0, 1]])]
        else:
            grow_stages = [(B_skel, R_skel, [[2], [0]]),
                           (None, W2_skel, [[1, 2], [3, 1]]),
                           (None, B_skel.conj(), [[1, 3], [2, 1]])]
        if ep is None:
            self.g1, e1 = contraction_plan(*grow_stages[0][:2],
                                           grow_stages[0][2])
            self.g2, e2 = contraction_plan(e1, grow_stages[1][1],
                                           grow_stages[1][2])
            self.g3, _ = contraction_plan(e2, grow_stages[2][1],
                                          grow_stages[2][2])
        else:
            self.g_chain, _ = chain_contraction_plan(
                grow_stages, ep=ep,
                reduce="none" if ep_capacity else "psum")
        ritz = ritz_method
        absorb = "right" if direction == "right" else "left"

        def step(dA, dB, dW1, dW2, dL, dR):
            # gauge/SVD/Lanczos precision trap — see _SiteProgram.step
            with jax.default_matmul_precision("highest"):
                return _step_body(dA, dB, dW1, dW2, dL, dR)

        def _step_body(dA, dB, dW1, dW2, dL, dR):
            def solve(da, db, dw1, dw2, dl, dr):
                th0 = self.theta(da, db)
                if ep is None:
                    mv = lambda x: self.mv4(
                        self.mv3(self.mv2(self.mv1(dl, x), dw1), dw2), dr)
                else:
                    mv = lambda x: self.mv_chain(dl, x, dw1, dw2, dr)
                evals, evecs = krylov.eigsh_lanczos(
                    mv, th0, num_krylov_vecs=self.m, numeig=1,
                    ritz_method=ritz, reorthogonalize=reorth)
                return evals[0], evecs[0]

            es, ths = jax.vmap(solve)(dA, dB, dW1, dW2, dL, dR)
            # EP: the ragged per-sector SVD truncation is itself
            # distributed (lax.switch branch per device + psum)
            ld, rd, terr = self.split(ths, absorb, ep=ep)

            def grow(dq, dw, denv):
                if ep is not None:
                    if direction == "right":
                        return self.g_chain(denv, dq, dw, dq)
                    return self.g_chain(dq, denv, dw, dq)
                if direction == "right":
                    return self.g3(self.g2(self.g1(denv, dq), dw), dq)
                return self.g3(self.g2(self.g1(dq, denv), dw), dq)

            if direction == "right":
                denv_new = jax.vmap(grow)(ld, dW1, dL)
            else:
                denv_new = jax.vmap(grow)(rd, dW2, dR)
            return es, ld, rd, terr, denv_new

        if ep_mesh is None:
            self._step = jax.jit(step)
        elif not ep_capacity:
            from jax.sharding import PartitionSpec as P
            self._step = jax.jit(jax.shard_map(
                step, mesh=ep_mesh,
                in_specs=(P(),) * 6, out_specs=(P(),) * 5,
                check_vma=False))
        else:
            from jax.sharding import PartitionSpec as P
            from tensornetwork_tpu.blocksparse.batched import (
                env_gather_full, env_scatter_stored)
            ndev, axis = ep
            nnzL, nnzR = L_skel.data.size, R_skel.data.size

            def step_cap(dA, dB, dW1, dW2, dLs, dRs):
                dL = env_gather_full(dLs[:, 0], nnzL, axis)
                dR = env_gather_full(dRs[:, 0], nnzR, axis)
                es, ld, rd, terr, denv_partial = step(dA, dB, dW1, dW2,
                                                      dL, dR)
                stored = env_scatter_stored(denv_partial, ndev, axis)
                return es, ld, rd, terr, stored[:, None, :]

            self._step = jax.jit(jax.shard_map(
                step_cap, mesh=ep_mesh,
                in_specs=(P(), P(), P(), P(), P(None, ep_axis, None),
                          P(None, ep_axis, None)),
                out_specs=(P(), P(), P(), P(), P(None, ep_axis, None)),
                check_vma=False))

    def __call__(self, dA, dB, dW1, dW2, dL, dR):
        return self._step(dA, dB, dW1, dW2, dL, dR)


def _install_two_site(cls):
    def _bond_program(self, bond: int, direction: str):
        key = ("2s", direction, self._structure_sig(
            self.skeleton[bond], self.skeleton[bond + 1],
            self.mpo[bond], self.mpo[bond + 1],
            self._Lskel[bond], self._Rskel[bond + 2]))
        if key not in self._programs:
            self._programs[key] = _BondProgram(
                self.skeleton[bond], self.skeleton[bond + 1],
                self.mpo[bond], self.mpo[bond + 1],
                self._Lskel[bond], self._Rskel[bond + 2], direction,
                self.m, self.ritz, self.reorth,
                ep_mesh=self.ep_mesh, ep_axis=self.ep_axis,
                ep_capacity=self.ep_capacity)
        return self._programs[key]

    def run_two_site(self, num_sweeps: int = 4, tol: float = 1e-10,
                     verbose: int = 0):
        """Two-site batched sweep: sector SVD truncation back onto the
        fixed bond profile (per-sector static ranks).  Returns the
        per-realization energies (B,) of the last sweep; accumulated
        squared discarded weights in ``self.truncation_errors``."""
        Rdata = [None] * (self.N + 1)
        Rdata[self.N] = self._boundary_env()
        for site in range(self.N - 1, 0, -1):
            run = self._canon_program(site)
            qd, prev2, rnew = run(self.data[site], self.data[site - 1],
                                  self.mpo_data[site], Rdata[site + 1])
            self.data[site] = qd
            self.data[site - 1] = prev2
            Rdata[site] = rnew
        e_prev = None
        es = None
        if not hasattr(self, "truncation_errors"):
            self.truncation_errors = []
        for sweep in range(num_sweeps):
            terr_total = jnp.zeros((self.B,), self.data[0].dtype)
            Ldata = [None] * (self.N + 1)
            Ldata[0] = self._boundary_env()
            for bond in range(self.N - 1):
                prog = self._bond_program(bond, "right")
                es, ld, rd, terr, lnew = prog(
                    self.data[bond], self.data[bond + 1],
                    self.mpo_data[bond], self.mpo_data[bond + 1],
                    Ldata[bond], Rdata[bond + 2])
                self.data[bond] = ld
                self.data[bond + 1] = rd
                Ldata[bond + 1] = lnew
                terr_total = terr_total + terr
            for bond in range(self.N - 2, -1, -1):
                prog = self._bond_program(bond, "left")
                es, ld, rd, terr, rnew = prog(
                    self.data[bond], self.data[bond + 1],
                    self.mpo_data[bond], self.mpo_data[bond + 1],
                    Ldata[bond], Rdata[bond + 2])
                self.data[bond] = ld
                self.data[bond + 1] = rd
                Rdata[bond + 1] = rnew
                terr_total = terr_total + terr
            es = np.asarray(jax.device_get(es))
            self.energies.append(es)
            self.truncation_errors.append(
                np.asarray(jax.device_get(terr_total)))
            if verbose:
                print(f"2s sweep {sweep}: E mean {es.mean():.10f} "
                      f"terr mean {float(terr_total.mean()):.3e}")
            e_mean = float(es.mean())
            if e_prev is not None and abs(e_mean - e_prev) < tol:
                break
            e_prev = e_mean
        return es

    cls._bond_program = _bond_program
    cls.run_two_site = run_two_site
    return cls


_install_two_site(BatchedSymmetricDMRG)


def _export_worker(spec, path, subset, platforms):
    """Process entry for :meth:`BatchedSymmetricDMRG.
    export_programs_parallel`: rebuild the solver on the CPU backend
    (tracing needs no device) and export the given key subset
    cross-platform."""
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
    import numpy as _np
    data = [_np.zeros((spec["B"], s.data.shape[0]), spec["data_dtype"])
            for s in spec["skeleton"]]
    solver = BatchedSymmetricDMRG(
        spec["skeleton"], data, spec["mpo"],
        num_krylov_vecs=spec["m"], ritz_method=spec["ritz"],
        reorth=spec["reorth"])
    solver.export_programs(path, subset=subset, platforms=platforms)
