"""TokenizeFeature FG_NORMAL with a real BPE tokenizer + TextNormalizer.

Reference: tzrec/features/tokenize_feature.py (bpe/sentencepiece via
vocab_file, TextNormalizer case folding / SBC2DBC / stop-char filter).
"""

import os

import numpy as np
import pyarrow as pa
import pytest
from google.protobuf import text_format

from torcheasyrec_tpu.features import create_features
from torcheasyrec_tpu.protos import feature_pb2
from torcheasyrec_tpu.protos.data_pb2 import FgMode

tokenizers = pytest.importorskip("tokenizers")


@pytest.fixture(scope="module")
def bpe_file(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=200, special_tokens=["[UNK]"], min_frequency=1
    )
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "how vexingly quick daft zebras jump",
    ] * 4
    tok.train_from_iterator(corpus, trainer)
    path = str(tmp_path_factory.mktemp("tok") / "tokenizer.json")
    tok.save(path)
    return path


def _feature(bpe_file, extra=""):
    cfg = text_format.Parse(
        f"""tokenize_feature {{
            feature_name: "txt" expression: "item:txt"
            embedding_dim: 8 vocab_file: "{bpe_file}"
            {extra}
        }}""",
        feature_pb2.FeatureConfig(),
    )
    return create_features([cfg], fg_mode=FgMode.FG_NORMAL)[0]


def test_tokenize_bpe_roundtrip(bpe_file):
    from tokenizers import Tokenizer

    f = _feature(bpe_file)
    tok = Tokenizer.from_file(bpe_file)
    assert f.num_embeddings == tok.get_vocab_size()
    texts = ["the quick brown fox", "", "lazy dog"]
    out = f._parse_fg({"txt": pa.array(texts)}, False)
    # lengths align with each text's real token count; empty -> 0
    expect = [len(tok.encode(t).ids) if t else 0 for t in texts]
    np.testing.assert_array_equal(out.lengths, expect)
    np.testing.assert_array_equal(
        out.values[: expect[0]], tok.encode(texts[0]).ids
    )
    assert (out.values < f.num_embeddings).all()


def test_tokenize_text_normalizer(bpe_file, tmp_path):
    stop = os.path.join(str(tmp_path), "stop.txt")
    with open(stop, "w") as f:
        f.write("!\n?\n")
    f = _feature(bpe_file, extra=f"""
        text_normalizer {{
            norm_options: [TEXT_UPPER2LOWER, TEXT_SBC2DBC, TEXT_FILTER]
            stop_char_file: "{stop}"
        }}""")
    # full-width chars fold to ASCII, case folds to lower, stop chars drop
    raw = "ＱＵＩＣＫ fox!"
    out = f._parse_fg({"txt": pa.array([raw, "quick fox"])}, False)
    n0, n1 = int(out.lengths[0]), int(out.lengths[1])
    np.testing.assert_array_equal(
        out.values[:n0], out.values[n0 : n0 + n1]
    )


def test_tokenize_max_length_skips_normalize(bpe_file):
    f = _feature(bpe_file, extra="""
        text_normalizer {
            max_length: 3
            norm_options: [TEXT_UPPER2LOWER]
        }""")
    # "FOX" (3 chars) normalizes; "QUICK FOX" (9) skips normalization
    out_short = f._parse_fg({"txt": pa.array(["FOX"])}, False)
    out_lower = f._parse_fg({"txt": pa.array(["fox"])}, False)
    np.testing.assert_array_equal(out_short.values, out_lower.values)
    out_long = f._parse_fg({"txt": pa.array(["QUICK FOX"])}, False)
    out_long_lower = f._parse_fg({"txt": pa.array(["quick fox"])}, False)
    assert not (
        len(out_long.values) == len(out_long_lower.values)
        and (out_long.values == out_long_lower.values).all()
    )
