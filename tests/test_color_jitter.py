"""ColorJitter parity with the reference transform chain.

The reference maps `color_jitter: true` to
`A.ColorJitter(brightness=0.4, contrast=0.4, saturation=0.4, hue=0.1, p=0.8)`
inserted before Normalize (reference: segmentation/train_denseclip.py:150-156).
These tests pin the config mapping, the torchvision-style op semantics
(grayscale blends, HSV hue rotation, random op order), and the apply
probability's distributional behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np

from denseclip_vit_multimodal_tpu.data.augment import (
    AugmentConfig,
    _color_jitter,
    _hsv_to_rgb,
    _rgb_to_hsv,
    augment_config_from_data_cfg,
)


class TestConfigMapping:
    def test_color_jitter_true_maps_to_reference_defaults(self):
        cfg = augment_config_from_data_cfg({"color_jitter": True})
        assert cfg.brightness == 0.4
        assert cfg.contrast == 0.4
        assert cfg.saturation == 0.4
        assert cfg.hue == 0.1
        assert cfg.color_jitter_prob == 0.8

    def test_color_jitter_absent_is_disabled(self):
        cfg = augment_config_from_data_cfg({})
        assert (cfg.brightness, cfg.contrast, cfg.saturation, cfg.hue) == (
            0.0, 0.0, 0.0, 0.0,
        )
        assert cfg.color_jitter_prob == 1.0

    def test_explicit_augment_keys_override_defaults(self):
        cfg = augment_config_from_data_cfg(
            {"color_jitter": True, "augment": {"hue": 0.05, "brightness": 0.2}}
        )
        assert cfg.brightness == 0.2
        assert cfg.hue == 0.05
        assert cfg.contrast == 0.4  # untouched default stays

    def test_eval_split_disables_jitter(self):
        cfg = augment_config_from_data_cfg({"color_jitter": True}, train=False)
        assert (cfg.brightness, cfg.contrast, cfg.saturation, cfg.hue) == (
            0.0, 0.0, 0.0, 0.0,
        )


class TestHSV:
    def test_roundtrip(self):
        rgb = jnp.asarray(
            np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
        )
        h, s, v = _rgb_to_hsv(rgb)
        back = _hsv_to_rgb(h, s, v)
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)

    def test_primary_colors(self):
        red = jnp.asarray([[[1.0, 0.0, 0.0]]])
        h, s, v = _rgb_to_hsv(red)
        assert float(h[0, 0]) == 0.0
        assert float(s[0, 0]) == 1.0
        assert float(v[0, 0]) == 1.0
        # rotating red by a third of the wheel gives green
        green = _hsv_to_rgb(h + 1.0 / 3.0, s, v)
        np.testing.assert_allclose(
            np.asarray(green[0, 0]), [0.0, 1.0, 0.0], atol=1e-6
        )


class TestColorJitterOp:
    CFG = AugmentConfig(
        brightness=0.4, contrast=0.4, saturation=0.4, hue=0.1,
        color_jitter_prob=0.8,
    )

    def _img(self):
        return jnp.asarray(
            np.random.RandomState(1).randint(0, 255, (24, 24, 3)).astype(
                np.float32
            )
        )

    def test_static_noop_when_disabled(self):
        img = self._img()
        out = _color_jitter(jax.random.PRNGKey(0), img, AugmentConfig())
        assert out is img  # no tracing work at all

    def test_output_in_range_and_shape(self):
        img = self._img()
        out = _color_jitter(jax.random.PRNGKey(0), img, self.CFG)
        assert out.shape == img.shape
        assert float(out.min()) >= 0.0 and float(out.max()) <= 255.0

    def test_apply_probability_distribution(self):
        """With p=0.8 the jitter should fire ~80% of the time."""
        img = self._img()
        fired = 0
        n = 200
        jit_fn = jax.jit(lambda k: _color_jitter(k, img, self.CFG))
        for i in range(n):
            out = jit_fn(jax.random.PRNGKey(i))
            if not np.allclose(np.asarray(out), np.asarray(img)):
                fired += 1
        assert 0.70 <= fired / n <= 0.90, fired / n

    def test_prob_zero_is_identity(self):
        img = self._img()
        cfg = self.CFG._replace(color_jitter_prob=0.0)
        out = _color_jitter(jax.random.PRNGKey(3), img, cfg)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(img))

    def test_hue_only_preserves_value_channel(self):
        """Hue rotation must not change the HSV value (max channel)."""
        img = self._img()
        cfg = AugmentConfig(hue=0.5, color_jitter_prob=1.0)
        out = _color_jitter(jax.random.PRNGKey(4), img, cfg)
        np.testing.assert_allclose(
            np.asarray(out.max(axis=-1)),
            np.asarray(img.max(axis=-1)),
            atol=1e-2,
        )

    def test_saturation_blends_toward_gray(self):
        """saturation factor below 1 moves pixels toward ITU-R 601 gray."""
        img = self._img()
        cfg = AugmentConfig(saturation=0.4, color_jitter_prob=1.0)
        gray = np.asarray(
            img @ jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
        )
        spread = lambda a: np.abs(np.asarray(a) - gray[..., None]).mean()
        base = spread(img)
        outs = [
            spread(_color_jitter(jax.random.PRNGKey(i), img, cfg))
            for i in range(8)
        ]
        # factors span [0.6, 1.4]; average chroma spread must move
        assert any(abs(o - base) > 1e-3 for o in outs)
        for o in outs:
            assert o < base * 1.45 + 1e-3

    def test_op_order_is_randomized(self):
        """Different keys with identical factor ranges must be able to
        produce different outputs purely from op ordering + factors."""
        img = self._img()
        outs = {
            np.asarray(
                _color_jitter(jax.random.PRNGKey(i), img, self.CFG)
            ).tobytes()
            for i in range(6)
        }
        assert len(outs) > 1
