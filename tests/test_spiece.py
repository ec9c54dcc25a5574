"""SentencePiece tokenizer_type support without the sentencepiece wheel.

Reference contract: TokenizeFeature accepts tokenizer_type
"sentencepiece" with a serialized spiece.model
(/root/reference/tzrec/features/tokenize_feature.py:149-159). The
loader (features/spiece.py) reads the ModelProto wire format directly
and segments with unigram Viterbi.
"""

import os
import struct

import numpy as np
import pyarrow as pa
import pytest
from google.protobuf import text_format

from torcheasyrec_tpu.features import create_features
from torcheasyrec_tpu.features.spiece import (
    SentencePieceModel,
    SpmTokenizerAdapter,
)
from torcheasyrec_tpu.protos import feature_pb2
from torcheasyrec_tpu.protos.data_pb2 import FgMode

REF_SPIECE = "/root/reference/data/test/spiece.model"


def _ld(fn: int, payload: bytes) -> bytes:
    """length-delimited protobuf field"""
    return bytes([(fn << 3) | 2]) + _varint(len(payload)) + payload


def _varint(x: int) -> bytes:
    out = b""
    while True:
        b = x & 0x7F
        x >>= 7
        out += bytes([b | (0x80 if x else 0)])
        if not x:
            return out


def _piece(text: str, score: float, ptype: int = 1) -> bytes:
    body = _ld(1, text.encode())
    body += bytes([(2 << 3) | 5]) + struct.pack("<f", score)
    body += bytes([(3 << 3) | 0]) + _varint(ptype)
    return _ld(1, body)


@pytest.fixture()
def tiny_model(tmp_path):
    """Hand-serialized ModelProto: vocab {<unk>, ▁, ▁the, ▁cat, c, a,
    t, ▁ca} with scores making '▁the ▁cat' segment as [▁the, ▁cat]."""
    buf = b"".join([
        _piece("<unk>", 0.0, ptype=2),       # id 0 (UNKNOWN)
        _piece("▁", -4.0),              # id 1
        _piece("▁the", -1.0),           # id 2
        _piece("▁cat", -1.5),           # id 3
        _piece("c", -3.0),                   # id 4
        _piece("a", -3.0),                   # id 5
        _piece("t", -3.0),                   # id 6
        _piece("▁ca", -2.0),            # id 7
    ])
    # trainer_spec { unk_id: 0 } (field 40 -> multi-byte varint key)
    buf += _ld(2, _varint((40 << 3) | 0) + _varint(0))
    path = str(tmp_path / "tiny.model")
    with open(path, "wb") as f:
        f.write(buf)
    return path


def test_unigram_viterbi_segmentation(tiny_model):
    m = SentencePieceModel.load(tiny_model)
    assert m.get_vocab_size() == 8
    assert m.unk_id == 0
    # "the cat" -> ▁the ▁cat: whole-word pieces beat char paths
    assert m.encode("the cat") == [2, 3]
    # "▁ca" + "t" (-2.0 - 3.0) beats "▁cat"? no: ▁cat = -1.5 wins
    assert m.encode("cat") == [3]
    # chars outside the vocab fall back to unk per character
    ids = m.encode("the qq cat")
    assert ids[0] == 2 and ids[-1] == 3
    assert m.unk_id in ids
    assert m.encode("") == []


def test_tokenize_feature_sentencepiece(tiny_model):
    fc = text_format.Parse(
        f"""tokenize_feature {{
            feature_name: "tok"
            expression: "user:txt"
            vocab_file: "{tiny_model}"
            tokenizer_type: "sentencepiece"
            embedding_dim: 8
        }}""",
        feature_pb2.FeatureConfig(),
    )
    (f,) = create_features([fc], fg_mode=FgMode.FG_NORMAL)
    assert f.num_embeddings == 8
    out = f._parse_fg(
        {"txt": pa.array(["the cat", "", "cat"])}, False
    )
    np.testing.assert_array_equal(out.lengths, [2, 0, 1])
    np.testing.assert_array_equal(out.values, [2, 3, 3])


@pytest.mark.skipif(
    not os.path.exists(REF_SPIECE), reason="reference spiece.model absent"
)
def test_reference_spiece_model_loads_and_encodes():
    """Self-consistency on the reference's real spm asset: pieces of
    the chosen segmentation must reconstruct the input text."""
    tok = SpmTokenizerAdapter.from_file(REF_SPIECE)
    vocab = tok.get_vocab_size()
    assert vocab > 1000  # a real model, not a stub
    text = "hello world this is a test"
    ids = tok.encode(text).ids
    assert ids and all(0 <= i < vocab for i in ids)
    m = tok.model
    joined = "".join(m.pieces[i][0] for i in ids)
    assert joined.replace("▁", " ").strip() == text