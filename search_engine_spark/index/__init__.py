from .codec import (
    decode_positions,
    decode_postings_block,
    encode_positions,
    encode_postings_block,
    varbyte_decode,
    varbyte_encode,
)

__all__ = [
    "varbyte_encode",
    "varbyte_decode",
    "encode_postings_block",
    "decode_postings_block",
    "encode_positions",
    "decode_positions",
]
