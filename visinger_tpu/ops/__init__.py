from visinger_tpu.ops.masking import (
    sequence_mask,
    slice_segments,
    rand_slice_segments,
)
from visinger_tpu.ops.expand import expand_states, mel2token_to_dur

__all__ = [
    "sequence_mask",
    "slice_segments",
    "rand_slice_segments",
    "expand_states",
    "mel2token_to_dur",
]
