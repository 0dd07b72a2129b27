"""BLIP train-processor augmentation (blip_processors.py:25-60 +
randaugment.py op/magnitude tables): op math, crop semantics,
provider determinism, trainer epoch-refresh wiring."""
import numpy as np
import pytest

from devqa_tpu.data import augment as A


def img_grad(size=32):
    """Deterministic gradient test image."""
    y, x = np.mgrid[0:size, 0:size]
    return np.stack([(x * 8) % 256, (y * 8) % 256, ((x + y) * 4) % 256],
                    -1).astype(np.uint8)


class TestOps:
    def test_identity_and_enhance_at_m5(self):
        """M=5 → enhance factor (5/10)*1.8+0.1 = 1.0 exactly: Brightness
        and Sharpness are identity at the train magnitude."""
        img = img_grad()
        rng = np.random.default_rng(0)
        assert np.array_equal(A._apply_op(img, "Identity", 5, rng), img)
        out = A._apply_op(img, "Brightness", 5, rng)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    def test_translate_shifts_content(self):
        img = img_grad()
        rng = np.random.default_rng(1)  # first random() decides the sign
        out = A._apply_op(img, "TranslateX", 10, rng)  # offset = ±10 px
        assert out.shape == img.shape
        # one vertical edge strip is the fill color after the shift
        left_fill = np.all(out[:, :10] == 128)
        right_fill = np.all(out[:, -10:] == 128)
        assert left_fill or right_fill

    def test_rotate_and_shear_fill(self):
        img = np.full((32, 32, 3), 255, np.uint8)
        rng = np.random.default_rng(0)
        rot = A._apply_op(img, "Rotate", 10, rng)  # ±30 degrees
        assert (rot == 128).any()  # corners filled
        sh = A._apply_op(img, "ShearX", 10, rng)
        assert sh.shape == img.shape and (sh == 128).any()

    def test_all_train_ops_run(self):
        img = img_grad()
        for name in A.TRAIN_AUGS:
            out = A._apply_op(img, name, 5, np.random.default_rng(2))
            assert out.shape == img.shape and out.dtype == np.uint8


class TestCropAndPipeline:
    def test_random_resized_crop_shape_and_scale(self):
        img = img_grad(64)
        rng = np.random.default_rng(0)
        out = A.random_resized_crop(img, 24, rng)
        assert out.shape == (24, 24, 3)

    def test_train_transform_deterministic_per_rng(self):
        img = img_grad(48)
        a = A.blip_train_transform(img, 32, np.random.default_rng(7))
        b = A.blip_train_transform(img, 32, np.random.default_rng(7))
        c = A.blip_train_transform(img, 32, np.random.default_rng(8))
        assert np.array_equal(a, b)
        assert not np.array_equal(a, c)


class TestProvider:
    def test_crops_original_resolution_when_available(self):
        """The train transform must crop the ORIGINAL image (reference
        BlipImageTrainProcessor order: RandomResizedCrop then resize),
        not a pre-squashed transport-resolution square."""
        calls = []

        class Base:
            def __call__(self, path):
                calls.append("transport")
                return img_grad(16)

            def load_raw(self, path):
                calls.append("raw")
                return img_grad(64)

        prov = A.AugmentingImageProvider(Base(), image_size=16, seed=0)
        out = prov("x.jpg")
        assert out.shape == (16, 16, 3)
        assert calls == ["raw"]  # original decoded; no transport resize

    def test_epoch_determinism_and_refresh(self):
        from devqa_tpu.data.images import SyntheticImageProvider

        base = SyntheticImageProvider(32)
        prov = A.AugmentingImageProvider(base, 32, seed=3)
        x1 = prov("a.jpg")
        x2 = prov("a.jpg")
        assert np.array_equal(x1, x2)  # cache-coherent within an epoch
        prov.reseed(1)
        y = prov("a.jpg")
        assert not np.array_equal(x1, y)  # refreshed across epochs
        assert x1.shape == (32, 32, 3) and x1.dtype == np.uint8

    def test_trainer_reseeds_and_clears_cache(self, tmp_path):
        import sys

        sys.path.insert(0, "tests")
        from helpers import make_tiny_vllm, write_records

        from devqa_tpu.data.schema import EVQA
        from devqa_tpu.editors.liveedit import LiveEditTrainable
        from devqa_tpu.retrieval.store import hash_encoder
        from devqa_tpu.train.loop import EditorTrainer
        from test_liveedit import tiny_liveedit_cfg

        vllm = make_tiny_vllm()
        path, _ = write_records(str(tmp_path), 4)
        vllm.image_provider = A.AugmentingImageProvider(
            vllm.image_provider, vllm.cfg.vit.image_size, seed=0)
        data = EVQA(path, str(tmp_path) + "/imgs", encoder=hash_encoder(16))
        editor = LiveEditTrainable(vllm, tiny_liveedit_cfg(vllm), seed=0)
        tr = EditorTrainer(editor, data, batch_size=4,
                           records_dir=str(tmp_path / "rec"),
                           train_name="aug", random_seed=0)
        tr.train(total_epochs=2, max_steps=2)
        assert vllm.image_provider.epoch >= 1  # reseed was driven
