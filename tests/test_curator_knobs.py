"""curate_* config knobs drive the Curator (VERDICT weak #5): weights,
bucket quotas, yaw quota toggle, pHash-similarity dedup mapping."""

import numpy as np

from person_capture_tpu.curator.core import (Item, mmr_select,
                                             phash_sim_to_hamm,
                                             quotas_from_bucket_fracs)


def _item(path, fd, sharp, expo, yaw=0.0, ph=0, ratio="2:3", frac=0.4):
    it = Item(path=path, face_fd=fd, sharpness=sharp, exposure=expo,
              yaw=yaw, phash=ph, ratio=ratio)
    it.face_frac = frac
    it.face_quality = 600.0
    return it


def test_quality_weights_change_ordering():
    sharp_far = _item("a", fd=0.40, sharp=0.95, expo=0.5)
    blurry_close = _item("b", fd=0.05, sharp=0.20, expo=0.5)
    # identity-heavy weights prefer the close match...
    for it in (sharp_far, blurry_close):
        it.qweights = (0.9, 0.05, 0.05)
    assert blurry_close.quality_score() > sharp_far.quality_score()
    # ...sharpness-heavy weights prefer the sharp one
    for it in (sharp_far, blurry_close):
        it.qweights = (0.05, 0.9, 0.05)
    assert sharp_far.quality_score() > blurry_close.quality_score()


def test_phash_sim_to_hamm():
    assert phash_sim_to_hamm(1.0) == 0
    assert phash_sim_to_hamm(0.92) == 5
    assert phash_sim_to_hamm(0.0) == 64


def test_bucket_quota_caps_apply():
    rng = np.random.default_rng(0)
    # 10 closeups; a tight closeup frac must cap their selection
    items = [_item(f"c{i}", fd=0.1, sharp=0.8, expo=0.8, ph=int(rng.integers(0, 2**63)),
                   frac=0.5) for i in range(10)]
    q_small = quotas_from_bucket_fracs((0.3, 0.5, 0.2))
    chosen, _ = mmr_select(items, max_images=10, quotas=q_small)
    assert len(chosen) <= max(2, int(round(0.3 * 10))) + 1
    q_big = quotas_from_bucket_fracs((1.0, 0.5, 0.2))
    chosen2, _ = mmr_select(items, max_images=10, quotas=q_big)
    assert len(chosen2) > len(chosen)


def test_yaw_quota_toggle():
    rng = np.random.default_rng(1)
    items = [_item(f"p{i}", fd=0.1, sharp=0.8, expo=0.8, ph=int(rng.integers(0, 2**63)),
                   yaw=35.0, frac=0.5) for i in range(8)]
    capped = quotas_from_bucket_fracs((1.0, 1.0, 1.0), use_yaw_quota=True,
                                      profile_cap_frac=0.25)
    open_ = quotas_from_bucket_fracs((1.0, 1.0, 1.0), use_yaw_quota=False)
    c1, _ = mmr_select(items, max_images=8, quotas=capped)
    c2, _ = mmr_select(items, max_images=8, quotas=open_)
    assert len(c1) <= 2  # 25% of 8
    assert len(c2) > len(c1)
