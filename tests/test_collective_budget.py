"""Communication lower-bound tripwire (VERDICT r3 task 4; SURVEY.md §2b).

The shard_map engine's design property — per step, the only cross-chip
traffic is scalar all-reduces; at resample steps a D-hop ring of
N/D-sized ppermutes plus ONE (D,)-scalar all-gather — is claimed in
``parallel/distributed.py`` docstrings.  These tests inspect the lowered
StableHLO of the full sharded program and pin the collective census, so a
regression (an accidental particle-sized all-gather under a new collector
or serve path) fails loudly instead of landing silently.

The GSPMD engine (``parallel/sharded.py``) has a different, documented
budget: the resample branch gathers particles (``X[A]`` under GSPMD), so
its census is pinned rather than bounded — any NEW collective trips the
count.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

import particles_tpu.core as core
import particles_tpu.kalman as kalman
import particles_tpu.state_space_models as ssms
from particles_tpu import distctx
from particles_tpu.parallel import distributed as dist
from particles_tpu.parallel import sharded

D, N, T = 8, 256, 4


@pytest.fixture(scope="module")
def fk_mesh():
    if len(jax.devices()) < D:
        pytest.skip("needs 8 (virtual) devices")
    ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.2)
    _, y = ssm.simulate(jax.random.key(0), T)
    fk = ssms.Bootstrap(ssm=ssm, data=y)
    return fk, sharded.make_mesh(D, ("particles",))


def _shardmap_stablehlo(fk, mesh, essrmin=0.5, apf_fk=None):
    Nloc = N // D
    the_fk = apf_fk if apf_fk is not None else fk

    def local_run(fk, key):
        with distctx.dist_context("particles", D):
            return core._run_full(fk, key, Nloc, T, False, "systematic",
                                  essrmin, None, False, None)

    carry_spec = core._Carry(key=P(), X=P("particles"), lw=P("particles"),
                             logLt=P(), log_mean_w=P(), col_states=P())
    f = dist._shard_map(local_run, mesh, in_specs=(P(), P()),
                        out_specs=(carry_spec, P(), P()))
    with mesh:
        return jax.jit(f).lower(the_fk, jax.random.key(1)).as_text()


def _stablehlo_census(txt):
    """Collective -> list of (operand_elems, result_elems)."""

    def elems(t):
        # t like "8xf32" / "1x8xi64" / "f32": product of leading dims
        parts = t.split("x")
        if len(parts) == 1:
            return 1
        return int(np.prod([int(p) for p in parts[:-1]]))

    out = {}
    # all_reduce carries a reducer REGION: its type signature is on the
    # closing line  "}) : (tensor<...>) -> tensor<...>"
    pat = (r'"stablehlo\.all_reduce".*?\}\) : \(tensor<([^>]*)>\)'
           r' -> tensor<([^>]*)>')
    out["all_reduce"] = [(elems(a), elems(b))
                         for a, b in re.findall(pat, txt, re.S)]
    # all_gather / all_to_all / collective_permute are single-line ops
    for kind in ("all_gather", "all_to_all", "collective_permute"):
        pat = (r'"stablehlo\.%s".*? : '
               r'\(tensor<([^>]*)>\) -> tensor<([^>]*)>' % kind)
        out[kind] = [(elems(a), elems(b))
                     for a, b in re.findall(pat, txt)]
    return out


class TestShardMapBudget:
    """Strict census for the hand-placed-collectives engine."""

    def test_bootstrap_census(self, fk_mesh):
        fk, mesh = fk_mesh
        c = _stablehlo_census(_shardmap_stablehlo(fk, mesh))
        Nloc = N // D
        # no all-to-all, ever
        assert c["all_to_all"] == []
        # exactly ONE all-gather: the (D,) shard-sum table of the ring
        assert len(c["all_gather"]) == 1, c["all_gather"]
        assert c["all_gather"][0] == (1, D), c["all_gather"]
        # every all-reduce is a SCALAR (the log-normaliser / ESS / logLt
        # reductions); pinned count: 3 in step0 + 3 in the scan body + 2
        # in the APF-free logLt accounting paths = 8 for this program
        assert all(a == 1 and b == 1 for a, b in c["all_reduce"]), \
            c["all_reduce"]
        assert len(c["all_reduce"]) == 8, len(c["all_reduce"])
        # ring traffic: N/D-sized collective_permutes only — 2 per hop
        # (z block + one state leaf), last hop's dead permutes DCE'd
        assert all(a == Nloc and b == Nloc
                   for a, b in c["collective_permute"]), \
            c["collective_permute"]
        assert len(c["collective_permute"]) == 2 * (D - 1), \
            len(c["collective_permute"])

    def test_apf_census_adds_no_collectives(self, fk_mesh):
        """APF under sharding: the aux-weight machinery adds exactly four
        scalar reductions (log_mean_exp(logeta, lw=lw) is two dist-aware
        logsumexps, each pmax + psum) and NO new particle-sized traffic —
        the round-4 recompute-instead-of-ring keeps the eta column off
        the wire."""
        fk, mesh = fk_mesh
        ssm = ssms.StochVol()
        _, y = ssm.simulate(jax.random.key(3), T)
        fka = ssms.AuxiliaryBootstrap(ssm=ssm, data=y)
        c = _stablehlo_census(_shardmap_stablehlo(fk, mesh, apf_fk=fka))
        Nloc = N // D
        assert c["all_to_all"] == []
        assert len(c["all_gather"]) == 1
        assert c["all_gather"][0] == (1, D)
        assert all(a == 1 and b == 1 for a, b in c["all_reduce"]), \
            c["all_reduce"]
        assert len(c["all_reduce"]) == 12, len(c["all_reduce"])
        assert all(a == Nloc and b == Nloc
                   for a, b in c["collective_permute"])
        assert len(c["collective_permute"]) == 2 * (D - 1)


class TestGspmdBudget:
    """Pinned census for the GSPMD engine: the resample branch gathers
    particles by design (X[A] under GSPMD — parallel/sharded.py
    docstring), so the tripwire is the exact op census, not a size
    bound."""

    def test_census_pinned(self, fk_mesh):
        fk, mesh = fk_mesh
        constrain = sharded.particle_constrain(mesh, "particles")
        from particles_tpu.ops import no_pallas

        @jax.jit
        def run(fk, key):
            return core._run_full(fk, key, N, T, False, "systematic",
                                  0.5, None, False, constrain)

        with mesh, no_pallas():
            txt = run.lower(fk, jax.random.key(1)).compile().as_text()
        census = {}
        for kind in ("all-gather", "all-reduce", "collective-permute",
                     "all-to-all"):
            types = re.findall(r"= (\S+) %s\(" % kind, txt)
            census[kind] = sorted(types)
        assert census["all-to-all"] == []
        # particle-sized gathers appear ONLY as the resample-branch
        # gather machinery: at most N-sized, and the number of
        # >=N-element gathers is pinned.  Round 5: the dense small-N
        # serve (N*M <= 2^22 here — N=256) replaced the counts+repeat
        # route, DROPPING one N-sized s32 gather, one all-reduce and two
        # permutes; the sub-N s32 gathers are the compare-count tree's
        # partials.  (At production N the Pallas/z route lowers
        # differently — this census pins the small-N GSPMD program.)
        def n_elems(t):
            m = re.search(r"\[(\d+)", t)
            return int(m.group(1)) if m else 1

        big_gathers = [t for t in census["all-gather"]
                       if n_elems(t) >= N]
        assert len(big_gathers) == 3, census["all-gather"]
        assert all(n_elems(t) <= N for t in census["all-gather"]), \
            census["all-gather"]
        assert all(n_elems(t) <= N for t in census["all-reduce"]), \
            census["all-reduce"]
        # total census pinned: a NEW collective (stray gather in a
        # collector / serve path) trips this even if small
        assert len(census["all-gather"]) == 8, census["all-gather"]
        assert len(census["all-reduce"]) == 9, census["all-reduce"]
        assert len(census["collective-permute"]) == 18, \
            census["collective-permute"]


class TestSamplerShardMapBudget:
    """Round 5 (VERDICT r4 task 1): census of ONE sharded sampler step
    (AdaptiveTempering, waste-free, d=1 conjugate target).

    Design budget: two Weights reductions + calibrate moments +
    per-MCMC-move acceptance means, ALL scalar; exactly TWO all-gathers
    — the (D,) ring shard-sum table and the ONE (N0,) llik gather that
    replaces ~120 latency-bound scalar all-reduces of the adaptive
    exponent bisection + path-sampling grid; ring traffic = 5 permutes
    per hop (z block + the 4 ThetaParticles leaves of this model), each
    N0/D-sized; no all-to-all.  Note collectives inside the P-1-step
    MCMC lax.scan appear ONCE in the lowered text (one scan region).
    """

    def test_adaptive_tempering_step_census(self, fk_mesh):
        _, mesh = fk_mesh
        import particles_tpu.smc_samplers as ssp
        from particles_tpu import distributions as dists

        class GaussTarget(ssp.StaticModel):
            def logpyt(self, theta, t):
                return (-0.5 * jnp.log(2 * jnp.pi)
                        - 0.5 * (self.data[t] - theta["m"]) ** 2)

        rng = np.random.default_rng(0)
        dat = jnp.asarray(rng.normal(size=10), jnp.float32)
        prior = dists.StructDist({"m": dists.Normal(scale=2.0)})
        model = GaussTarget(data=dat, prior=prior)
        fk = ssp.AdaptiveTempering(model=model, len_chain=10)
        Ns = 128
        Nloc = Ns // D
        N0loc = fk.N0(Nloc)

        def local_step(fk, carry, t):
            with distctx.dist_context("particles", D):
                carry2, view = ssp._sampler_step(
                    fk, carry, t, Ns, "systematic", 0.5)
            return carry2, {"rs_flag": view.rs_flag, "loglt": view.loglt}

        key = jax.random.key(0)
        carry_shapes = jax.eval_shape(
            lambda f, k: ssp._sampler_step0(f, k, Nloc), fk, key)
        carry_spec = dist._sampler_carry_specs(
            carry_shapes, N0loc, "particles")
        fk_spec = jax.tree_util.tree_map(lambda _: P(), fk)
        f0 = dist._shard_map(
            lambda fk, k: ssp._sampler_step0(fk, k, Nloc), mesh,
            in_specs=(fk_spec, P()), out_specs=carry_spec)
        f = dist._shard_map(
            local_step, mesh, in_specs=(fk_spec, carry_spec, P()),
            out_specs=(carry_spec, P()))
        with mesh:
            carry = jax.jit(f0)(fk, key)
            txt = jax.jit(f).lower(fk, carry, jnp.int32(1)).as_text()
        c = _stablehlo_census(txt)
        assert c["all_to_all"] == []
        # scalar-only all-reduces, pinned count (update CONSCIOUSLY)
        assert all(a == 1 and b == 1 for a, b in c["all_reduce"]), \
            c["all_reduce"]
        assert len(c["all_reduce"]) == 8, c["all_reduce"]
        # exactly two all-gathers: (D,) table + ONE (N0loc -> N0) llik
        assert sorted(c["all_gather"]) == [
            (1, D), (N0loc, N0loc * D)], c["all_gather"]
        # ring: 5 permutes/hop (z + 4 leaves), N0loc-sized, last hop DCE'd
        assert all(a == N0loc and b == N0loc
                   for a, b in c["collective_permute"]), \
            c["collective_permute"]
        assert len(c["collective_permute"]) == 5 * (D - 1), \
            len(c["collective_permute"])


class TestSMC2ShardMapBudget:
    """Round 5 (final): census of ONE sharded SMC² step (theta-sharded,
    LinearGauss inner filters, Nx=32, len_chain=3, non-waste-free).

    Design budget: the inner particle filters contribute ZERO collectives
    — their (Nx,) weight reductions are theta-local and must stay so
    (``distctx.local_context()`` inside the SMC2 model; a regression here
    means inner filters are being silently summed across shards).  What
    remains is the sampler scaffolding: scalar-only all-reduces, exactly
    ONE (D,) all-gather (the ring shard-sum table — SMC² needs no (N0,)
    llik gather, its potential is the local inner-filter increment), and
    the theta-resample ring at 7 permutes/hop: z block + the 6
    ThetaParticles leaves (theta, lpost, loglik Nloc-sized; pf_key
    2*Nloc uint32; xs and lws Nloc*Nx-sized — whole inner-filter pytrees
    ride the ring).
    """

    def test_smc2_step_census(self, fk_mesh):
        _, mesh = fk_mesh
        import particles_tpu.smc_samplers as ssp
        from particles_tpu import distributions as dists

        true = kalman.LinearGauss(rho=0.8, sigmaX=1.0, sigmaY=0.5)
        _, y = true.simulate(jax.random.key(0), 6)

        class LGfixed(kalman.LinearGauss):
            default_params = {
                "sigmaY": 0.5, "rho": 0.9, "sigmaX": 1.0, "sigma0": None
            }

        prior = dists.StructDist({"rho": dists.Uniform(a=-0.99, b=0.99)})
        Nx = 32
        fk = ssp.SMC2(ssm_cls=LGfixed, prior=prior, data=y, init_Nx=Nx,
                      len_chain=3)
        Ns = 128
        Nloc = Ns // D
        N0loc = fk.N0(Nloc)

        def local_step(fk, carry, t):
            with distctx.dist_context("particles", D):
                carry2, view = ssp._sampler_step(
                    fk, carry, t, Ns, "systematic", 0.5)
            return carry2, {"rs_flag": view.rs_flag, "loglt": view.loglt}

        key = jax.random.key(0)
        carry_shapes = jax.eval_shape(
            lambda f, k: ssp._sampler_step0(f, k, Nloc), fk, key)
        carry_spec = dist._sampler_carry_specs(
            carry_shapes, N0loc, "particles")
        fk_spec = jax.tree_util.tree_map(lambda _: P(), fk)
        f0 = dist._shard_map(
            lambda fk, k: ssp._sampler_step0(fk, k, Nloc), mesh,
            in_specs=(fk_spec, P()), out_specs=carry_spec)
        f = dist._shard_map(
            local_step, mesh, in_specs=(fk_spec, carry_spec, P()),
            out_specs=(carry_spec, P()))
        with mesh:
            carry = jax.jit(f0)(fk, key)
            txt = jax.jit(f).lower(fk, carry, jnp.int32(1)).as_text()
        c = _stablehlo_census(txt)
        assert c["all_to_all"] == []
        # scalar-only all-reduces, pinned count (update CONSCIOUSLY)
        assert all(a == 1 and b == 1 for a, b in c["all_reduce"]), \
            c["all_reduce"]
        assert len(c["all_reduce"]) == 9, c["all_reduce"]
        # exactly ONE all-gather: the (D,) ring shard-sum table — the
        # inner filters must contribute NOTHING
        assert c["all_gather"] == [(1, D)], c["all_gather"]
        # ring: 7 permutes/hop (z + 6 leaves), last hop DCE'd; permute
        # sizes pin the payload set (inner-filter states ride whole)
        sizes = sorted(set(a for a, _ in c["collective_permute"]))
        assert sizes == [Nloc, 2 * Nloc, Nloc * Nx], sizes
        assert len(c["collective_permute"]) == 7 * (D - 1), \
            len(c["collective_permute"])


class TestShardedFFBSBudget:
    """Round 5 (VERDICT r4 task 6): the sharded FFBS backward pass moves
    ONLY frame-sized all-gathers — L+2 per step (L = state leaves, plus
    lw_t and A_{t+1}), 2+L one-off gathers for the final frame, zero
    all-reduces, zero permutes, zero all-to-all.  The scan body appears
    once in the lowered text."""

    def test_backward_census(self, fk_mesh):
        fk, mesh = fk_mesh
        import particles_tpu as particles
        from particles_tpu.parallel import distributed as dist

        pf = particles.SMC(fk=fk, N=N, key=jax.random.key(1),
                           store_history=True)
        pf.run()
        txt = dist.sharded_backward_mcmc(
            pf.hist, jax.random.key(2), 64, mesh, lower_only=True)
        c = _stablehlo_census(txt)
        Nloc = N // D
        assert c["all_to_all"] == []
        assert c["all_reduce"] == [], c["all_reduce"]
        assert c["collective_permute"] == [], c["collective_permute"]
        # L=1 state leaf: 3 gathers in the scan body (X_t, lw_t, A_t1)
        # + 2 outside (lw_T, X_T), all (Nloc -> N)-sized
        assert all(a == Nloc and b == N for a, b in c["all_gather"]), \
            c["all_gather"]
        assert len(c["all_gather"]) == 5, c["all_gather"]
