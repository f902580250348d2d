"""Text tokenizer tests.

Mirrors the reference test strategy (tests/test_tokenizer.cpp): structural
tests always run; golden-token assertions run when a real model GGUF is
available (QWEN3_TTS_MODEL_DIR env var), using the exact vectors from
test_tokenizer.cpp:13-15, 73-122.
"""

import os

import pytest

from qwen3_tts_tpu.config import TokenizerSpecialTokens
from qwen3_tts_tpu.tokenizer import TextTokenizer, _byte_to_unicode


def make_tiny_tokenizer():
    """Tiny synthetic vocab exercising BPE mechanics."""
    tokens = [
        "<|im_start|>", "<|im_end|>", "assistant", "Ċ",  # 0..3
        "h", "e", "l", "o", "Ġ", "w", "r", "d", ".",     # 4..12
        "he", "ll", "hell", "hello", "Ġw", "Ġwo",        # 13..18
    ]
    merges = ["h e", "l l", "he ll", "hell o", "Ġ w", "Ġw o"]
    sp = TokenizerSpecialTokens(bos_token_id=0, eos_token_id=1,
                                pad_token_id=1)
    tok = TextTokenizer(tokens, merges, sp)
    return tok


def test_bpe_greedy_merge_order():
    tok = make_tiny_tokenizer()
    # "hello" -> h e l l o -> (h e) -> he l l o -> (l l) -> he ll o
    # -> (he ll) -> hell o -> (hell o) -> hello
    assert tok.encode("hello") == [16]
    # "hell" stops at rank-2 merge
    assert tok.encode("hell") == [15]


def test_space_prefix_word_split():
    tok = make_tiny_tokenizer()
    # "hello wo" -> ["hello", "Ġwo"]
    assert tok.encode("hello wo") == [16, 18]


def test_unknown_char_byte_fallback():
    tok = make_tiny_tokenizer()
    # "x" not in vocab and has no byte token -> dropped (matches reference
    # behavior of skipping unknown byte tokens, text_tokenizer.cpp:277-287)
    assert tok.encode("x") == []


def test_encode_for_tts_template():
    tok = make_tiny_tokenizer()
    ids = tok.encode_for_tts("hello")
    sp = tok.special
    assert ids == [sp.bos_token_id, sp.assistant_token_id, sp.newline_token_id,
                   16,
                   sp.eos_token_id, sp.newline_token_id,
                   sp.bos_token_id, sp.assistant_token_id, sp.newline_token_id]
    # assistant/newline resolved from the tiny vocab
    assert sp.assistant_token_id == 2
    assert sp.newline_token_id == 3


def test_decode_roundtrip():
    tok = make_tiny_tokenizer()
    ids = tok.encode("hello world.")
    assert tok.decode(ids) == "hello world."


def test_byte_table_matches_reference_quirk():
    # The reference's BYTE_TO_UNICODE shifts bytes >= 173
    # (text_tokenizer.cpp:23-28): byte 173 -> "®", byte 255 -> "Ń".
    t = _byte_to_unicode()
    assert t[0] == "Ā"
    assert t[32] == "Ġ"
    assert t[126] == "~"
    assert t[127] == "ġ"
    assert t[160] == "ł"
    assert t[161] == "¡"
    assert t[172] == "¬"
    assert t[173] == "®"
    assert t[254] == "ÿ"
    assert t[255] == "Ń"
    # table must be a bijection for decode to invert encode
    assert len(set(t.values())) == 256


MODEL_DIR = os.environ.get("QWEN3_TTS_MODEL_DIR")


@pytest.mark.skipif(not MODEL_DIR, reason="real model GGUF not available")
def test_golden_tokens_real_model():
    """Golden vectors from the reference test (test_tokenizer.cpp:13-15)."""
    from qwen3_tts_tpu.io.gguf import GGUFReader
    path = os.path.join(MODEL_DIR, "qwen3-tts-0.6b-f16.gguf")
    with GGUFReader(path) as r:
        tok = TextTokenizer.from_gguf(r)
    enc = tok.encode("Hello.")
    assert 9707 in enc and 13 in enc
    assert tok.encode_for_tts("Hello.") == [
        151644, 77091, 198, 9707, 13, 151645, 198, 151644, 77091, 198]
    assert tok.decode(tok.encode("Hello, world!")) == "Hello, world!"


def test_decode_multibyte_across_tokens():
    """decode() must concatenate raw bytes across tokens BEFORE UTF-8
    interpretation (text_tokenizer.cpp:332-338): a multi-byte character
    split over byte-fallback tokens decoded per-token yields U+FFFD."""
    from qwen3_tts_tpu.tokenizer import _byte_to_unicode
    b2u = _byte_to_unicode()
    tokens = [b2u[i] for i in range(256)]  # one token per raw byte
    sp = TokenizerSpecialTokens(bos_token_id=0, eos_token_id=1,
                                pad_token_id=1)
    tok = TextTokenizer(tokens, [], sp)
    text = "héllo 你好"   # é (2 bytes), 你好 (3 bytes each)
    ids = tok.encode(text)
    assert len(ids) > len(text)        # chars really split across tokens
    assert tok.decode(ids) == text
