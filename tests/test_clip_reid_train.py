"""CLIP ReID synthetic training: renderer invariants, a train-step smoke,
the bundled trained tower discriminating HELD-OUT identities, and the
zoo/CLI resolution path (main.resolve_reid) that replaced silent
random-init ViT-L construction (reference reid_embedder.py:10-57 downloads
pretrained OpenCLIP; this image has no egress)."""

import numpy as np
import pytest

from person_capture_tpu.train.clip_reid_synth import (make_identities,
                                                      render_person_crop)


def test_renderer_shapes_and_determinism_by_identity():
    rng = np.random.default_rng(5)
    ident = make_identities(rng, 8)
    crop = render_person_crop(np.random.default_rng(1), ident, 0, 96)
    assert crop.shape == (96, 96, 3)
    assert crop.dtype == np.uint8
    # different identities render with different clothing statistics
    a = np.stack([render_person_crop(np.random.default_rng(i), ident, 0, 96)
                  for i in range(4)]).mean(axis=(0, 1, 2))
    b = np.stack([render_person_crop(np.random.default_rng(i), ident, 1, 96)
                  for i in range(4)]).mean(axis=(0, 1, 2))
    assert np.abs(a - b).max() > 2.0


def test_train_step_decreases_loss():
    import jax
    import jax.numpy as jnp
    import optax

    from person_capture_tpu.models import clip_vit as CV
    from person_capture_tpu.train.clip_reid_synth import (make_train_step,
                                                          sample_crop_batch)

    cfg = CV.TINY
    model, variables = CV.init_clip(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ident = make_identities(rng, 8)
    wclass = (rng.normal(size=(8, cfg.embed_dim)) * 0.05).astype(np.float32)
    tx = optax.adam(3e-3)
    state = {"params": variables["params"], "wclass": jnp.asarray(wclass),
             "opt_state": tx.init({"params": variables["params"],
                                   "wclass": jnp.asarray(wclass)})}
    step = make_train_step(model, tx, 8)
    losses = []
    for i in range(30):
        crops, labels = sample_crop_batch(np.random.default_rng(i), ident,
                                          16, cfg.image_size)
        state, m = step(state, crops, labels)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


@pytest.mark.slow
def test_bundled_reid_weights_discriminate_heldout_identities():
    """The shipped clip_reid_s_synth.npz must separate identities it never
    saw in training — a weights regression fails here."""
    import jax.numpy as jnp  # noqa: F401  (backend pinned by conftest)

    from person_capture_tpu.models import clip_vit as CV
    from person_capture_tpu.models.zoo import resolve_weights
    from person_capture_tpu.train.clip_reid_synth import evaluate

    w = resolve_weights("auto", "clip_reid_s")
    assert w is not None, "bundled clip_reid_s_synth.npz missing"
    model = CV.ClipViT(CV.REID_S)
    ev = evaluate(model, w, np.random.default_rng(123), n_ident=12,
                  crops_per=5)
    assert ev["intra_cos"] > 0.75, ev
    assert ev["inter_cos"] < 0.35, ev
    assert ev["eer"] <= 0.12, ev
    # the equal-error threshold sits below the pipeline's defaults
    # (reid_thresh 0.42 / faceless 0.40), so default configs discriminate
    assert ev["rd_threshold"] <= 0.42, ev


def test_resolve_reid_auto_prefers_bundled_tower():
    from person_capture_tpu.main import resolve_reid
    from person_capture_tpu.models import clip_vit as CV

    cfg, w = resolve_reid("ViT-L-14", "auto")
    assert cfg is CV.REID_S
    assert w is not None

    cfg, w = resolve_reid("ViT-L-14", "random")
    assert cfg is CV.VIT_L_14
    assert w is None

    with pytest.raises(FileNotFoundError):
        resolve_reid("ViT-L-14", "/nonexistent/reid.npz")


def test_reid_backend_with_bundled_weights_embeds_consistently():
    """Same person crop → near-identical embedding; different clothing →
    distant. Exercises the production ClipReidBackend ingest path."""
    from person_capture_tpu.main import resolve_reid
    from person_capture_tpu.pipeline.backends import ClipReidBackend
    from person_capture_tpu.train.clip_reid_synth import (make_identities,
                                                          render_person_crop)

    cfg, w = resolve_reid("ViT-L-14", "auto")
    backend = ClipReidBackend(cfg=cfg, batch=4, weights=w)
    ident = make_identities(np.random.default_rng(9), 2)
    crops = [render_person_crop(np.random.default_rng(i), ident, i % 2, 128)
             for i in range(4)]
    feats = backend.extract(crops)
    assert feats.shape == (4, cfg.embed_dim)
    same = float(feats[0] @ feats[2])      # identity 0 vs identity 0
    diff = float(feats[0] @ feats[1])      # identity 0 vs identity 1
    assert same > diff + 0.15, (same, diff)
