import numpy as np

from lra_tpu.sim_model import ErrorModel


def test_uniform_model_simulation(rng):
    from lra_tpu.sim import random_genome
    g = random_genome(rng, 50000)
    m = ErrorModel.uniform(mismatch=0.01, ins=0.005, dele=0.005)
    m.log_mu, m.log_sigma = 8.0, 0.2
    reads = list(m.simulate(rng, g, n_reads=10))
    assert len(reads) == 10
    for name, codes in reads:
        assert len(codes) > 100
        assert codes.max() <= 3
    # coverage mode stops near the target
    total = sum(len(c) for _, c in m.simulate(rng, g, coverage=2.0))
    assert total >= 2.0 * len(g)


def test_model_save_load(tmp_path, rng):
    m = ErrorModel.uniform()
    m.lengths = rng.integers(1000, 9000, 50)
    p = str(tmp_path / "m.npz")
    m.save(p)
    m2 = ErrorModel.load(p)
    assert np.allclose(m.probs, m2.probs)
    assert np.array_equal(m.lengths, m2.lengths)
