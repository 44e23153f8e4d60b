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
    FULL 204.8k-step budget, 2 fresh seeds per side. Gates are
    calibrated from the committed 5-seed full-budget matrix
    (docs/h2h_cartpole5.json, 2026-08-19): reference tail
    84.9 ± 14.1 over seeds {69.9, 73.0, 83.8, 88.3, 109.7}; repo
    71.1 ± 4.5 over {66.6 .. 77.8} — within 1σ of the reference's seed
    spread; per-decile curves show the repo learning FASTER early and
    the mean gap coming from two lucky reference tail seeds."""
    ref, repo = _band('cartpole', seeds=[1, 2])
    # committed 5-seed statistics (per side, full budget)
    REF5_STD = 14.1
    REPO5_MEAN, REPO5_STD = 71.1, 4.5

    # both sides must clearly learn (random play lasts ~22 steps)
    random_play = 22.0
    assert ref.mean() > 2 * random_play, f'reference did not learn: {ref}'
    assert repo.mean() > 2 * random_play, f'repo did not learn: {repo}'
    # variance-calibrated parity: the fresh 2-seed repo mean must sit
    # within 2 standard errors of the fresh reference mean, where the
    # spread of a 2-seed mean difference is estimated from the
    # committed per-side seed stds
    se_diff = np.sqrt(REF5_STD ** 2 / 2 + REPO5_STD ** 2 / 2)
    assert repo.mean() >= ref.mean() - 2.0 * se_diff, (ref, repo, se_diff)
    # drift gate vs the repo's own committed level: a regression of
    # >2.5 repo-sigmas from 71.1 fails even if the reference run is
    # unlucky
    assert repo.mean() >= REPO5_MEAN - 2.5 * REPO5_STD, (repo, REPO5_MEAN)
