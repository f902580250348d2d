"""Golden-activation regression tests.

Compares current model outputs against frozen fixtures
(tests/golden/tiny_activations.npz, produced by tools/make_goldens.py).
Catches unintended numeric drift across refactors — the role the
reference's dumped-tensor diffing played (SURVEY.md §4). Regenerate the
fixtures deliberately when numerics change on purpose.
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden" / "tiny_activations.npz"
pytestmark = pytest.mark.skipif(not GOLDEN.exists(),
                                reason="golden fixtures not generated")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.fixture(scope="module")
def current():
    import make_goldens
    return make_goldens.build_fixture()


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN))


@pytest.mark.parametrize("name,atol", [
    ("prefill_embd", 1e-4),
    ("trailing_hidden", 1e-4),
    ("prefill_logits", 5e-3),
    ("prefill_hidden", 1e-3),
    ("vocoder_audio", 1e-4),
    ("speaker_embedding", 1e-3),
    ("mel_spectrogram", 1e-4),
])
def test_activation_matches_golden(current, golden, name, atol):
    got, want = current[name], golden[name]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3,
                               err_msg=f"{name} drifted from golden")


@pytest.mark.parametrize("name", ["greedy_codes", "greedy_valid",
                                  "code_pred_codes"])
def test_discrete_outputs_match_golden(current, golden, name):
    np.testing.assert_array_equal(current[name], golden[name],
                                  err_msg=f"{name} drifted from golden")
