import jax
import jax.numpy as jnp
import numpy as np

from visinger_tpu.ops.expand import expand_states, mel2token_to_dur
from visinger_tpu.ops.masking import rand_slice_segments, sequence_mask, slice_segments


def test_sequence_mask():
    m = sequence_mask(jnp.asarray([2, 4]), 5)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[True, True, False, False, False], [True, True, True, True, False]],
    )


def test_expand_states_gather():
    h = jnp.asarray(np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4))
    mel2ph = jnp.asarray([[1, 1, 2, 3, 0], [2, 2, 2, 0, 0]])
    out = expand_states(h, mel2ph)
    assert out.shape == (2, 5, 4)
    np.testing.assert_array_equal(np.asarray(out[0, 0]), np.asarray(h[0, 0]))
    np.testing.assert_array_equal(np.asarray(out[0, 2]), np.asarray(h[0, 1]))
    np.testing.assert_array_equal(np.asarray(out[0, 4]), np.zeros(4))  # padding
    np.testing.assert_array_equal(np.asarray(out[1, 0]), np.asarray(h[1, 1]))


def test_mel2token_to_dur_roundtrip():
    mel2ph = jnp.asarray([[1, 1, 2, 3, 3, 3, 0, 0]])
    dur = mel2token_to_dur(mel2ph, 4)
    np.testing.assert_array_equal(np.asarray(dur), [[2, 1, 3, 0]])


def test_slice_segments():
    x = jnp.asarray(np.arange(2 * 10 * 3, dtype=np.float32).reshape(2, 10, 3))
    out = slice_segments(x, jnp.asarray([0, 4]), 4)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(x[0, 0:4]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(x[1, 4:8]))


def test_rand_slice_respects_lengths():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 20, 2).astype(np.float32))
    lengths = jnp.asarray([8, 20, 12, 9])
    for seed in range(5):
        _, ids = rand_slice_segments(jax.random.PRNGKey(seed), x, 8, lengths)
        ids = np.asarray(ids)
        assert (ids + 8 <= np.asarray(lengths)).all()
        assert (ids >= 0).all()
