"""End-to-end learn-and-speak proof on CPU: a deterministic mini-corpus
is trained through the REAL CLIs (extract_fsq -> train_dac ->
extract_dac_latents -> train flow -> train llm) and then synthesized
through the REAL zero-shot inference API; the trained system must
reproduce its training data (reference success criteria:
TRAINING_GUIDE.md:223-224 — "LLM acc >95%, flow recon <0.1").

The TPU-budget variant (full convergence bars) is
scripts/overfit_pipeline.py; this CPU test uses reduced budgets and
correspondingly looser — but still discriminative — bars: every stage
must demonstrably LEARN (vs. the measured random/untrained baselines:
token_match ~1/4000, flow_nmse ~1.0, dac_snr ~-12 dB).
"""
import json
import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("MSTPU_E2E"),
    reason="multi-hour CPU overfit; opt in with MSTPU_E2E=1 (the TPU "
           "proof runs via scripts/overfit_supervised.sh — metrics in "
           "STATUS.md)")
def test_overfit_learns_and_speaks(tmp_path):
    import overfit_pipeline as ofp

    metrics = ofp.run(tmp_path / "ofit", n_utts=2, seg_seconds=0.9,
                      dac_iters=400, flow_epochs=4000,
                      flow_polish_epochs=800, llm_epochs=150)
    print(json.dumps(metrics))

    # stage 1 LM: learned the text->token mapping (reference bar is
    # acc>0.95 at convergence; CPU budget reaches it on 2 utterances)
    assert metrics["llm_train_acc"] >= 0.95
    # and REPRODUCES the held-in continuation token-for-token through
    # the real sampling decode (random baseline: ~1/4000 per token)
    assert metrics["token_match"] >= 0.9
    assert metrics["token_len_err"] <= 4

    # codec: reconstruction clearly above the untrained baseline
    # (measured -11.7 dB before any training)
    assert metrics["dac_snr_db"] >= 3.0
    assert metrics["dac_corr"] >= 0.5

    # stage 2 flow: a single CFM draw is GT + generative spread
    # (untrained baseline: nmse ~1.0); the 4-draw posterior mean
    # isolates the learned conditional mean (measured at this budget:
    # per-draw ~0.32, mean4 ~0.12; at the TPU budget mean4 ~0.056,
    # i.e. under the reference "recon < 0.1" bar)
    assert metrics["flow_nmse"] <= 0.55
    assert metrics["flow_nmse_mean4"] <= 0.25

    # the system *speaks* its training data through the real zero-shot
    # API (held-in spk2info prompt context): EOS lands at the right
    # duration and the posterior-mean decode carries the right
    # per-frame content (wrong-content pitch-track baseline <= 0.36;
    # sample-wise wav xcorr is phase-blindsided and only reported)
    assert abs(metrics["syn_seconds"] - 0.9) <= 0.25
    assert metrics["pitch_acc_mean4"] >= 0.5
    assert metrics["wav_corr_oracle"] >= 0.1
