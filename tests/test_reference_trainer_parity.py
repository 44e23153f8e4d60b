"""Head-to-head learning parity vs the ACTUAL reference trainer.

Trains /root/reference/clean_pufferl.py (via the tools/ref_trainer.py
shims: gym->gymnasium alias, pyximport stub, reference-exact numpy
c_gae) and the repo trainer on the same envs with the SAME
hyperparameters and step budgets, then asserts the converged score
levels agree within seed variance (BASELINE.md: "learning curves within
seed variance of reference"; reference clean_pufferl.py:30-304).

The full 4-env x 3-seed matrix with curves lives in
docs/PARITY.md + experiments/head_to_head.json (tools/head_to_head.py);
this test re-runs a reduced matrix so drift in the repo's learning
behavior fails CI.
"""
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REF = '/root/reference'
if not os.path.exists(os.path.join(REF, 'clean_pufferl.py')):
    pytest.skip('reference tree not present', allow_module_level=True)

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tools'))

import head_to_head  # noqa: E402


def _band(env, seeds):
    """Run both sides; return (ref_tails, repo_tails)."""
    ref_tails = [head_to_head.run_reference(env, s)['tail']
        for s in seeds]
    repo_tails = [head_to_head.run_repo(env, s)['tail'] for s in seeds]
    return np.asarray(ref_tails), np.asarray(repo_tails)


def test_squared_learning_matches_reference():
    """Ocean squared, LSTM, reference ocean hyperparameters (lr 0.017,
    30k steps): both sides converge to the same score level."""
    ref, repo = _band('squared', seeds=[1, 2])
    # both solve the env
    assert ref.mean() > 0.8, f'reference failed to learn: {ref}'
    assert repo.mean() > 0.8, f'repo failed to learn: {repo}'
    # within seed variance: band = 3*std with an absolute floor
    tol = max(3.0 * ref.std(), 0.08)
    assert abs(repo.mean() - ref.mean()) <= tol, (ref, repo)


def test_stochastic_learning_matches_reference():
    """Ocean stochastic: optimal play is a 0.7/0.3 mixed strategy;
    score ~= 1 - (p - freq)^2 must match."""
    ref, repo = _band('stochastic', seeds=[1])
    assert ref.mean() > 0.9 and repo.mean() > 0.9, (ref, repo)
    assert abs(repo.mean() - ref.mean()) <= 0.05, (ref, repo)


def test_multiagent_learning_matches_reference():
    """Ocean multiagent: the PettingZoo padded-agent path on the
    reference side vs the device engine's batched agent lanes — both
    must reach perfect per-agent scores (the multi-agent training h2h;
    ref emulation.py:236-426 + clean_pufferl agent-keyed infos)."""
    ref, repo = _band('multiagent', seeds=[1])
    assert ref.mean() > 0.9, f'reference failed to learn: {ref}'
    assert repo.mean() > 0.9, f'repo failed to learn: {repo}'
    assert abs(repo.mean() - ref.mean()) <= 0.05, (ref, repo)


def test_spaces_beats_reference():
    """Ocean spaces (Dict obs + Dict action through emulation): the
    repo's trace-time nativize must keep SOLVING both action components
    (score >= 0.9) where the reference's byte-fed Default plateaus near
    the 0.5 one-component level (docs/PARITY.md). Guards the nativize
    advantage rather than symmetric parity."""
    repo = np.asarray([head_to_head.run_repo('spaces', 1)['tail']])
    assert repo.mean() > 0.9, f'repo failed to solve spaces: {repo}'


def test_cartpole_learning_matches_reference():
    """Real gymnasium CartPole through each side's host path, MLP, the
    FULL 204.8k-step budget, 2 fresh seeds per side, BOTH sides with
    the reference Default's init scheme (torch-default kaiming-uniform
    encoder/value head — head_to_head HP repo_init='torch').

    History: the old matrix ran the repo with its CleanRL orthogonal
    init and trailed 71.1 vs 84.9 (docs/h2h_cartpole5.json). The 4-arm
    init ablation (tools/ablate_init.py, docs/ablate_init_cartpole.json,
    2026-08-20) root-caused the gap to the INIT, not the trainer:
    semi-orthogonal rows underscale the encoder at CartPole's 4-dim obs
    (ref w/ orthogonal init drops 89.1 -> 61.0; repo w/ torch init
    jumps 71.1 -> 128.1). With matched init the repo trainer WINS:
    repo 128.1 ± 10.8 vs reference 89.1 ± 12.0 over 5 seeds. Gates are
    calibrated from that committed matrix."""
    ref, repo = _band('cartpole', seeds=[1, 2])
    # committed 5-seed statistics (per side, full budget, matched init;
    # docs/ablate_init_cartpole.json arms ref/torch and repo/torch)
    REF5_STD = 12.0
    REPO5_MEAN, REPO5_STD = 128.1, 10.8

    # both sides must clearly learn (random play lasts ~22 steps)
    random_play = 22.0
    assert ref.mean() > 2 * random_play, f'reference did not learn: {ref}'
    assert repo.mean() > 2 * random_play, f'repo did not learn: {repo}'
    # parity: the fresh 2-seed repo mean must sit within 2 standard
    # errors of the fresh reference mean (spread of a 2-seed mean
    # difference estimated from the committed per-side seed stds).
    # With the committed +39 repo advantage this has ~5 sigma headroom
    # — a healthy run cannot plausibly fail it.
    se_diff = np.sqrt(REF5_STD ** 2 / 2 + REPO5_STD ** 2 / 2)
    assert repo.mean() >= ref.mean() - 2.0 * se_diff, (ref, repo, se_diff)
    # drift gate vs the repo's own committed level: a regression of
    # >2.5 repo-sigmas from 128.1 fails even if the reference run is
    # unlucky
    assert repo.mean() >= REPO5_MEAN - 2.5 * REPO5_STD, (repo, REPO5_MEAN)
