"""API-surface parity: every public class/function of the reference
(nchopin/particles, SURVEY.md §2 inventory) must exist in the
corresponding module here.  Guards against silent surface regressions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


REFERENCE_SURFACE = {
    "particles_tpu": ["SMC", "SQMC", "FeynmanKac", "multiSMC"],
    "particles_tpu.distributions": [
        "ProbDist", "LocScaleDist", "Normal", "Logistic", "Laplace", "Beta",
        "Gamma", "InvGamma", "LogNormal", "Uniform", "Student", "FlatNormal",
        "Dirac", "TruncNormal", "DiscreteDist", "Poisson", "Binomial",
        "Geometric", "NegativeBinomial", "Categorical", "DiscreteUniform",
        "TransformedDist", "LinearD", "LogD", "LogitD", "Mixture",
        "MixMissing", "Dirichlet", "MvNormal", "VaryingCovNormal",
        "IndepProd", "IID", "Cond", "StructDist",
    ],
    "particles_tpu.state_space_models": [
        "StateSpaceModel", "Bootstrap", "GuidedPF", "APFMixin",
        "AuxiliaryPF", "AuxiliaryBootstrap", "StochVol", "StochVolLeverage",
        "Gordon_etal", "BearingsOnly", "DiscreteCox", "MVStochVol",
        "ThetaLogistic",
    ],
    "particles_tpu.smc_samplers": [
        "StaticModel", "TemperingBridge", "all_distinct", "FancyList",
        "view_2d_array", "gen_concatenate", "ThetaParticles",
        "ImportanceSampler", "ArrayMCMC", "ArrayMetropolis",
        "ArrayRandomWalk", "ArrayIndependentMetropolis", "MCMCSequence",
        "MCMCSequenceWF", "AdaptiveMCMCSequence", "FKSMCsampler", "IBIS",
        "Tempering", "next_annealing_epn", "AdaptiveTempering", "var_wf",
        "Var_phi", "Var_logLt", "rec_to_dict", "SMC2",
    ],
    "particles_tpu.mcmc": [
        "MCMC", "VanishCovTracker", "GenericRWHM", "BasicRWHM", "PMMH",
        "CSMC", "GenericGibbs", "ParticleGibbs",
    ],
    "particles_tpu.smoothing": [
        "ParticleHistory", "PartialParticleHistory",
        "RollingParticleHistory", "generate_hist_obj", "smoothing_worker",
    ],
    "particles_tpu.collectors": [
        "Collector", "Moments", "Fixed_lag_smooth", "Online_smooth_naive",
        "Online_smooth_ON2", "Paris",
    ],
    "particles_tpu.resampling": [
        "Weights", "exp_and_normalise", "essl", "log_sum_exp",
        "wmean_and_var", "wquantiles", "resampling", "multinomial",
        "residual", "stratified", "systematic", "ssp", "killing",
        "idiotic", "inverse_cdf", "uniform_spacings", "MultinomialQueue",
    ],
    "particles_tpu.kalman": [
        "MeanAndCov", "predict_step", "filter_step", "smoother_step",
        "MVLinearGauss", "MVLinearGauss_Guarniero_etal", "LinearGauss",
        "Kalman",
    ],
    "particles_tpu.hmm": ["HMM", "GaussianHMM", "BaumWelch"],
    "particles_tpu.nested": [
        "NestedParticles", "NestedSampling", "Nested_RWmoves",
        "NestedSamplingSMC", "MeanCovTracker", "unif_minus_one",
    ],
    "particles_tpu.binary_smc": [
        "Bernoulli", "NestedLogistic", "BinaryMetropolis",
        "chol_and_friends", "VariableSelection", "BayesianVS",
        "BayesianVS_gprior", "all_binary_words",
    ],
    "particles_tpu.variance_estimators": ["Var", "Var_logLt", "Lag_based_var"],
    "particles_tpu.variance_mcmc": [
        "MCMC_variance", "AutoCovarianceCalculator",
        "autocovariance_fft_single", "default_collector",
    ],
    "particles_tpu.hilbert": ["hilbert_sort", "Hilbert_to_int", "invlogit"],
    "particles_tpu.rqmc": ["sobol", "halton", "latin", "safe_generate"],
    "particles_tpu.utils": ["timer", "multiplexer", "add_to_dict",
                        "cartesian_lists", "distribute_work",
                        "worker", "seeder"],
    "particles_tpu.datasets": [
        "GBP_vs_USD_9798", "Nutria", "Neuro", "Pima", "Eeg", "Sonar",
        "Boston", "Concrete", "Liver",
    ],
}


@pytest.mark.parametrize("module_name", sorted(REFERENCE_SURFACE))
def test_surface(module_name):
    import importlib

    mod = importlib.import_module(module_name)
    missing = [n for n in REFERENCE_SURFACE[module_name]
               if not hasattr(mod, n)]
    assert not missing, f"{module_name} missing: {missing}"


class TestLongTailHelpers:
    """Reference long-tail helpers (found by AST-diffing the reference's
    public defs against our modules)."""

    def test_cartesian_lists(self):
        from particles_tpu import utils

        out = utils.cartesian_lists({"a": [0, 2], "b": [3, 4]})
        assert out == [{"a": 0, "b": 3}, {"a": 0, "b": 4},
                       {"a": 2, "b": 3}, {"a": 2, "b": 4}]

    def test_distribute_work(self):
        from particles_tpu import utils

        res = utils.distribute_work(lambda a, b: a + b,
                                    [{"a": 1, "b": 2}, {"a": 3, "b": 4}])
        assert [r["output"] for r in res] == [3, 7]
        assert res[0]["a"] == 1  # inputs carried through

    def test_worker_queue(self):
        import queue

        from particles_tpu import utils

        qin, qout = queue.Queue(), queue.Queue()
        qin.put((0, {"x": 2}))
        qin.put((1, {"x": 5}))
        qin.put((None, None))
        utils.worker(qin, qout, lambda x: x * x)
        got = dict(qout.get() for _ in range(2))
        assert got == {0: 4, 1: 25}

    def test_seeder(self):
        from particles_tpu import utils

        @utils.seeder
        def f(key=None):
            return jax.random.uniform(key, ())

        a, b = float(f(seed=3)), float(f(seed=3))
        c = float(f(seed=4))
        assert a == b and a != c

    def test_safe_generate(self):
        from scipy.stats import qmc

        from particles_tpu import rqmc

        u = rqmc.safe_generate(64, 3, qmc.Sobol)
        assert u.shape == (64, 3)
        assert (u > 0).all() and (u < 1).all()

    def test_autocovariance_fft_single(self):
        from particles_tpu import variance_mcmc as vm

        rng = np.random.default_rng(0)
        x = rng.normal(size=200)
        res = vm.autocovariance_fft_single(x)
        # lag-0 == biased variance; cross-check a direct lag-3 estimate
        np.testing.assert_allclose(res[0], np.var(x), rtol=1e-10)
        xc = x - x.mean()
        np.testing.assert_allclose(res[3], np.sum(xc[:-3] * xc[3:]) / len(x),
                                   rtol=1e-10)
        assert vm.default_collector([x[:50], x[50:]]).shape == (200,)

    def test_nested_particles_container(self):
        from particles_tpu import nested

        th = {"mu": jnp.arange(4.0)}
        npart = nested.NestedParticles(theta=th, lprior=jnp.zeros(4),
                                       llik=jnp.ones(4))
        assert npart.N == 4
        leaves = jax.tree_util.tree_leaves(npart)
        assert len(leaves) == 3  # registered pytree: mu, lprior, llik

    def test_invlogit(self):
        from particles_tpu import hilbert

        np.testing.assert_allclose(float(hilbert.invlogit(0.0)), 0.5)


class TestListHelpers:
    """Host-side list-container helpers (reference smc_samplers.py:319-398)."""

    def test_all_distinct(self):
        from particles_tpu import smc_samplers as ssp

        objs = [{"v": i} for i in range(4)]
        out = ssp.all_distinct(objs, np.array([2, 2, 0, 2]))
        assert out[0] is objs[2]
        assert out[1] is not out[0] and out[3] is not out[0]
        out[1]["v"] = 99
        assert out[0]["v"] == 2  # mutation does not leak across copies

    def test_fancy_list(self):
        from particles_tpu import smc_samplers as ssp

        fl = ssp.FancyList([[1], [2], [3]])
        sub = fl[np.array([1, 1, 0])]
        assert len(sub) == 3
        assert sub[0] is fl[1] and sub[1] is not sub[0]
        cat = ssp.gen_concatenate(fl, sub)
        assert isinstance(cat, ssp.FancyList) and len(cat) == 6
        fl2 = fl.copy()
        fl2.copyto(ssp.FancyList([[9], [9], [9]]), where=[True, False, True])
        assert fl2[0] == [9] and fl2[1] == [2] and fl2[2] == [9]

    def test_gen_concatenate_arrays(self):
        from particles_tpu import smc_samplers as ssp

        a = ssp.gen_concatenate(jnp.arange(3), jnp.arange(3))
        assert isinstance(a, jax.Array) and a.shape == (6,)
        b = ssp.gen_concatenate(np.arange(3), np.arange(2))
        assert isinstance(b, np.ndarray) and b.shape == (5,)


def test_reference_readme_quickstart():
    """The reference's README example runs verbatim, modulo the one
    documented API difference (explicit PRNG key in simulate/SMC):
    undeclared model parameters (sigma) become attributes, simulate
    returns (x, y), and the bootstrap filter runs with defaults."""
    import particles_tpu as particles
    import particles_tpu.state_space_models as ssm
    import particles_tpu.distributions as dists

    class ToySSM(ssm.StateSpaceModel):
        def PX0(self):
            return dists.Normal()

        def PX(self, t, xp):
            return dists.Normal(loc=xp)

        def PY(self, t, xp, x):
            return dists.Normal(loc=x, scale=self.sigma)

    my_model = ToySSM(sigma=0.2)
    x, y = my_model.simulate(jax.random.key(0), 200)
    assert len(x) == len(y) == 200
    alg = particles.SMC(fk=ssm.Bootstrap(ssm=my_model, data=y), N=200)
    alg.run()
    assert np.isfinite(float(alg.logLt))
