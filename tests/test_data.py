"""Data-layer tests against generated on-disk fixtures: a miniature MegaDepth
tree (pairs.txt + images + depth h5 + cached features) and an image folder for
the homography dataset. No real datasets needed (SURVEY.md §4: fixed-seed
synthetic fixtures replace MegaDepth)."""

import numpy as np
import pytest

from openglue_tpu.data import (
    BalancedSceneSampler,
    DataLoader,
    HomographyPairsDataset,
    MegaDepthPairsDataset,
    MegaDepthPairsDatasetFeatures,
    MegaDepthPairsIndex,
    stack_keypoints_batch,
)
from openglue_tpu.data.io import save_h5

W_ORIG, H_ORIG = 480, 360
TARGET = (320, 240)
# Cached features are extracted at aspect-preserving resize, so exactly ONE
# dimension exceeds the training target (reference extract_features resize
# contract); with extraction size (480, 360), crop height only.
TARGET_CACHED = (480, 240)


def make_megadepth_fixture(root, scenes=("scene_a", "scene_b"), pairs_per_scene=3,
                           with_features=True, num_kpts=50, desc_dim=32, seed=0):
    import cv2
    import h5py

    rng = np.random.default_rng(seed)
    K = np.array([[400.0, 0, W_ORIG / 2], [0, 400.0, H_ORIG / 2], [0, 0, 1]])
    for scene in scenes:
        img_dir = root / "phoenix/S6/zl548/MegaDepth_v1" / scene / "dense0/imgs"
        depth_dir = root / "phoenix/S6/zl548/MegaDepth_v1" / scene / "dense0/depths"
        pairs_dir = root / "pairs" / scene / "sparse-txt"
        feat_dir = root / "features_cache" / scene
        for d in (img_dir, depth_dir, pairs_dir, feat_dir):
            d.mkdir(parents=True, exist_ok=True)

        names = []
        for i in range(pairs_per_scene + 1):
            name = f"im{i}.jpg"
            names.append(name)
            img = rng.integers(0, 255, (H_ORIG, W_ORIG, 3), np.uint8)
            cv2.imwrite(str(img_dir / name), img)
            depth = rng.uniform(2.0, 8.0, (H_ORIG, W_ORIG)).astype(np.float32)
            with h5py.File(depth_dir / f"im{i}.h5", "w") as f:
                f.create_dataset("depth", data=depth)
            if with_features:
                # cached features at "extraction size" = original size
                lafs = np.zeros((num_kpts, 2, 3), np.float32)
                lafs[:, 0, 0] = lafs[:, 1, 1] = 1.0
                lafs[:, 0, 2] = rng.uniform(0, W_ORIG - 1, num_kpts)
                lafs[:, 1, 2] = rng.uniform(0, H_ORIG - 1, num_kpts)
                save_h5(feat_dir / f"im{i}_lafs.h5", lafs)
                save_h5(feat_dir / f"im{i}_scores.h5", rng.uniform(0, 1, num_kpts).astype(np.float32))
                save_h5(feat_dir / f"im{i}_descriptors.h5", rng.normal(size=(num_kpts, desc_dim)).astype(np.float32))
                save_h5(feat_dir / f"im{i}_size.h5", np.asarray([W_ORIG, H_ORIG]))

        lines = []
        for i in range(pairs_per_scene):
            R = np.eye(3)
            T = np.array([0.1 * (i + 1), 0.0, 0.0])
            RT = np.eye(4)
            RT[:3, :3], RT[:3, 3] = R, T
            overlap = 0.2 + 0.1 * i
            parts = (
                [names[i], names[i + 1], "0", "0"]
                + [f"{x:.6f}" for x in K.flatten()]
                + [f"{x:.6f}" for x in K.flatten()]
                + [f"{x:.6f}" for x in RT.flatten()]
                + [f"{overlap:.3f}"]
            )
            lines.append(" ".join(parts))
        (pairs_dir / "pairs.txt").write_text("\n".join(lines) + "\n")
    return K


class TestIndex:
    def test_parse_and_overlap_filter(self, tmp_path):
        make_megadepth_fixture(tmp_path)
        idx = MegaDepthPairsIndex(tmp_path, ["scene_a", "scene_b"])
        assert len(idx) == 6
        rec = idx[0]
        assert rec.K0.shape == (3, 3) and rec.R.shape == (3, 3) and rec.T.shape == (3,)
        filtered = MegaDepthPairsIndex(
            tmp_path, ["scene_a", "scene_b"], overlap=(0.25, 0.45)
        )
        # overlaps are 0.2/0.3/0.4 per scene -> 2 pass per scene
        assert len(filtered) == 4
        capped = MegaDepthPairsIndex(tmp_path, ["scene_a"], max_pairs_per_scene=1)
        assert len(capped) == 1
        missing = MegaDepthPairsIndex(tmp_path, ["nonexistent"])
        assert len(missing) == 0


class TestOnlineDataset:
    def test_sample_shapes_and_intrinsics_update(self, tmp_path):
        make_megadepth_fixture(tmp_path)
        ds = MegaDepthPairsDataset(tmp_path, ["scene_a"], target_size=TARGET)
        sample = ds[0]
        assert sample["image0"].shape == (TARGET[1], TARGET[0])
        assert sample["transformation"]["depth0"].shape == (TARGET[1], TARGET[0])
        # principal point must stay at the crop center (center crop of a
        # centered camera): cx = W/2 scaled then shifted by crop start
        K0 = sample["transformation"]["K0"]
        np.testing.assert_allclose(K0[0, 2], TARGET[0] / 2, atol=1.0)
        np.testing.assert_allclose(K0[1, 2], TARGET[1] / 2, atol=1.0)
        assert 0.0 <= sample["image0"].min() and sample["image0"].max() <= 1.0


class TestCachedDataset:
    def test_crop_filters_and_shifts_keypoints(self, tmp_path):
        make_megadepth_fixture(tmp_path)
        ds = MegaDepthPairsDatasetFeatures(
            tmp_path, "features_cache", ["scene_a"], target_size=TARGET_CACHED
        )
        s = ds[0]
        for i in (0, 1):
            lafs = s[f"lafs{i}"]
            n = lafs.shape[0]
            assert 0 < n < 50, "height crop must drop some keypoints"
            assert n == s[f"scores{i}"].shape[0] == s[f"descriptors{i}"].shape[0]
            # all surviving keypoints inside the crop
            assert (lafs[:, 0, 2] >= 0).all() and (lafs[:, 0, 2] < TARGET_CACHED[0]).all()
            assert (lafs[:, 1, 2] >= 0).all() and (lafs[:, 1, 2] < TARGET_CACHED[1]).all()
        assert s["transformation"]["depth0"].shape == (TARGET_CACHED[1], TARGET_CACHED[0])


class TestCollate:
    def test_pad_and_subsample(self, tmp_path):
        make_megadepth_fixture(tmp_path)
        ds = MegaDepthPairsDatasetFeatures(
            tmp_path, "features_cache", ["scene_a", "scene_b"], target_size=TARGET_CACHED
        )
        samples = [ds[i] for i in range(3)]
        # target above available -> pad; mask marks real kpts; depth>0 there
        batch = stack_keypoints_batch(samples, target_num_keypoints=64, random=False)
        assert batch.side0.keypoints.shape == (3, 64, 2)
        assert batch.side0.descriptors.shape == (3, 64, 32)
        assert batch.side0.side_info.shape == (3, 64, 1)
        n_real = batch.side0.mask.sum(axis=1)
        assert (n_real <= 50).all() and (n_real > 0).all()
        assert (batch.transformation.depth0[~batch.side0.mask] == 0).all()
        assert (batch.transformation.depth0[batch.side0.mask] > 0).all()

        # target below available -> top-score selection keeps highest scores
        small = stack_keypoints_batch(samples, target_num_keypoints=8, random=False)
        assert small.side0.mask.all()
        for s, sel in zip(samples, small.side0.side_info[..., 0]):
            thresh = np.sort(s["scores0"])[-8]
            assert (sel >= thresh - 1e-6).all()

    def test_collate_is_jit_consumable(self, tmp_path):
        import jax

        from openglue_tpu.geometry.gt_matches import generate_gt_matches

        make_megadepth_fixture(tmp_path)
        ds = MegaDepthPairsDatasetFeatures(
            tmp_path, "features_cache", ["scene_a"], target_size=TARGET_CACHED
        )
        batch = stack_keypoints_batch([ds[0], ds[1]], target_num_keypoints=64)
        gt = jax.jit(
            lambda b: generate_gt_matches(
                b.side0.keypoints, b.side1.keypoints, b.transformation,
                positive_threshold=3.0, mask0=b.side0.mask, mask1=b.side1.mask,
            )
        )(batch)
        assert gt["gt_matches0"].shape == (2, 64)
        # padded keypoints must be IGNORE (-2)
        m = np.asarray(batch.side0.mask)
        assert (np.asarray(gt["gt_matches0"])[~m] == -2).all()


class TestSampler:
    def test_scene_balanced(self):
        sampler = BalancedSceneSampler(
            {"big": 900, "small": 100}, seed=1, num_shards=1, shard_index=0
        )
        it = iter(sampler)
        draws = [next(it) for _ in range(4000)]
        small_frac = np.mean([d >= 900 for d in draws])
        assert 0.4 < small_frac < 0.6  # uniform over scenes, not pairs

    def test_shards_disjoint_streams(self):
        a = iter(BalancedSceneSampler({"s": 100}, seed=5, num_shards=2, shard_index=0))
        b = iter(BalancedSceneSampler({"s": 100}, seed=5, num_shards=2, shard_index=1))
        assert [next(a) for _ in range(50)] != [next(b) for _ in range(50)]


class TestLoader:
    def test_prefetch_preserves_order_and_content(self):
        data = list(range(100))
        loader = DataLoader(
            data, batch_size=10, collate_fn=lambda xs: sum(xs), num_workers=3
        )
        out = list(loader)
        assert out == [sum(range(i, i + 10)) for i in range(0, 100, 10)]

    def test_worker_exception_propagates(self):
        def bad_collate(xs):
            raise RuntimeError("boom")

        loader = DataLoader(list(range(10)), batch_size=5, collate_fn=bad_collate, num_workers=2)
        with pytest.raises(RuntimeError, match="boom"):
            list(loader)

    def test_sampler_exception_propagates_to_consumer(self):
        # an exception raised by the sampler/batch_sampler iterator surfaces
        # in the consumer instead of silently killing the feeder thread and
        # blocking __iter__ forever (found by the round-5 verify drive)
        def bad_sampler():
            yield from (1, 2, 3)
            raise RuntimeError("sampler boom")

        loader = DataLoader(
            list(range(10)), batch_size=2, collate_fn=sum,
            sampler=bad_sampler(), num_workers=2,
        )
        with pytest.raises(RuntimeError, match="sampler boom"):
            list(loader)

    def test_empty_scene_sampler_raises_at_construction(self):
        with pytest.raises(ValueError, match="no scene has any pairs"):
            BalancedSceneSampler({"a": 0}, num_shards=1, shard_index=0)

    def test_infinite_sampler_bounded(self):
        loader = DataLoader(
            list(range(10)),
            batch_size=2,
            collate_fn=list,
            sampler=iter(lambda: 3, None),  # infinite 3s
            num_workers=0,
            num_batches=5,
        )
        assert len(list(loader)) == 5


class TestHomographyDataset:
    def test_warp_consistency(self, tmp_path):
        import cv2

        rng = np.random.default_rng(0)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        # structured image so warp correspondence is checkable
        img = np.zeros((400, 500, 3), np.uint8)
        for _ in range(60):
            x, y = rng.integers(50, 450), rng.integers(50, 350)
            cv2.circle(img, (int(x), int(y)), rng.integers(5, 20), rng.integers(50, 255, 3).tolist(), -1)
        cv2.imwrite(str(img_dir / "a.png"), img)

        ds = HomographyPairsDataset(
            img_dir, target_size=(320, 240), max_corner_offset=40,
            color_augmentation=False, seed=3,
        )
        s = ds[0]
        assert s["image0"].shape == (240, 320)
        H = s["transformation"]["H"]
        # warp image0 by H -> must closely match image1 in the valid interior
        warped = cv2.warpPerspective(s["image0"], H, (320, 240))
        interior = np.s_[60:180, 80:240]
        diff = np.abs(warped[interior] - s["image1"][interior])
        assert np.median(diff) < 0.05


class TestLoaderBackpressure:
    def test_reorder_buffer_bounded(self):
        import threading
        import time as time_mod

        in_flight = []
        lock = threading.Lock()
        peak = [0]

        def collate(xs):
            with lock:
                in_flight.append(1)
                peak[0] = max(peak[0], len(in_flight))
            return sum(xs)

        loader = DataLoader(
            list(range(400)), batch_size=4, collate_fn=collate,
            num_workers=4, prefetch=3,
        )
        out = []
        for batch in loader:
            time_mod.sleep(0.002)  # slow consumer
            with lock:
                if in_flight:
                    in_flight.pop()
            out.append(batch)
        assert len(out) == 100
        # admission window = prefetch + num_workers => at most that many
        # batches beyond the consumer (+1 slack for the pop accounting race)
        assert peak[0] <= 3 + 4 + 1, f"peak in-flight {peak[0]}"


class TestBucketing:
    def test_choose_bucket(self):
        from openglue_tpu.data.bucketing import batch_bucket, choose_bucket

        assert choose_bucket(100, (256, 512, 1024)) == 256
        assert choose_bucket(300, (256, 512, 1024)) == 512
        assert choose_bucket(2000, (256, 512, 1024)) == 1024
        assert batch_bucket([100, 400], (256, 512, 1024)) == 512

    def test_collate_with_buckets(self, tmp_path):
        make_megadepth_fixture(tmp_path)  # 50 kpts per image
        ds = MegaDepthPairsDatasetFeatures(
            tmp_path, "features_cache", ["scene_a"], target_size=TARGET_CACHED
        )
        samples = [ds[0], ds[1]]
        batch = stack_keypoints_batch(
            samples, target_num_keypoints=1024, buckets=(64, 256, 1024)
        )
        # ~40-50 surviving kpts -> the 64 bucket, not 1024
        assert batch.side0.keypoints.shape[1] == 64
        assert batch.side0.mask.any()
        # target cap still respected
        small = stack_keypoints_batch(
            samples, target_num_keypoints=32, buckets=(64, 256)
        )
        assert small.side0.keypoints.shape[1] == 32

    @staticmethod
    def _fake_sample(count: int):
        import numpy as np

        return {"lafs0": np.zeros((count, 2, 3)), "lafs1": np.zeros((count // 2 + 1, 2, 3))}

    def test_bucket_grouped_batches(self):
        from openglue_tpu.data.bucketing import BucketGroupedBatches

        # counts alternating small/large: per-batch bucketing would pad every
        # batch of 4 to 1024; grouping emits uniform small and large batches
        counts = [100, 900, 120, 950, 90, 800, 110, 990, 70, 850, 130, 920]
        grouped = list(
            BucketGroupedBatches(
                (self._fake_sample(c) for c in counts),
                batch_size=4,
                buckets=(256, 1024),
                collate_fn=lambda ss: [s["lafs0"].shape[0] for s in ss],
            )
        )
        assert len(grouped) == 3
        assert all(len(batch) == 4 for batch in grouped)
        # stream-phase batches (all but the tail merge) are bucket-uniform
        for batch in grouped[:2]:
            kinds = {c <= 256 for c in batch}
            assert len(kinds) == 1, f"mixed-bucket batch: {batch}"
        # the tail merge drains largest-bucket leftovers first
        assert grouped[2][:2] == [850, 920]

    def test_bucket_grouped_tail_and_drop_last(self):
        from openglue_tpu.data.bucketing import BucketGroupedBatches

        counts = [100, 900, 120, 950, 90]  # no bucket fills a batch of 4
        kwargs = dict(
            batch_size=4,
            buckets=(256, 1024),
            collate_fn=lambda ss: [s["lafs0"].shape[0] for s in ss],
        )
        dropped = list(
            BucketGroupedBatches((self._fake_sample(c) for c in counts), **kwargs)
        )
        # leftovers merge largest-first into one full batch; the remaining
        # single sample is dropped (drop_last default)
        assert len(dropped) == 1 and len(dropped[0]) == 4
        assert dropped[0][:2] == [900, 950]  # largest bucket drains first
        kept = list(
            BucketGroupedBatches(
                (self._fake_sample(c) for c in counts), drop_last=False, **kwargs
            )
        )
        assert len(kept) == 2 and len(kept[1]) == 1

    def test_bucket_grouped_num_batches_bound(self):
        import itertools

        from openglue_tpu.data.bucketing import BucketGroupedBatches

        infinite = (self._fake_sample(c) for c in itertools.cycle([100, 900]))
        grouped = BucketGroupedBatches(
            infinite,
            batch_size=2,
            buckets=(256, 1024),
            collate_fn=len,
            num_batches=5,
        )
        assert len(list(grouped)) == 5


class TestHostInvariantGrouping:
    """BucketGroupedIndexBatches (VERDICT round-4 #5): grouping computed on
    indices + cheap counts, identically on every host; slices partition each
    global batch; the DataLoader runs collate (with the carried force_bucket)
    in its worker pool."""

    BUCKETS = (256, 1024)

    @staticmethod
    def _counts(i):
        return 100 if i % 2 else 900

    def test_schedule_identical_across_hosts_and_slices_partition(self):
        from openglue_tpu.data.bucketing import BucketGroupedIndexBatches

        stream = list(range(64))
        make = lambda sl: list(
            BucketGroupedIndexBatches(
                iter(stream), self._counts, batch_size=8,
                buckets=self.BUCKETS, local_slice=sl,
            )
        )
        full, h0, h1 = make(None), make((0, 4)), make((4, 8))
        assert len(full) == len(h0) == len(h1) == 8
        for (idxs, kw), (a, kw0), (b, kw1) in zip(full, h0, h1):
            assert kw == kw0 == kw1
            assert list(a) + list(b) == list(idxs)
            assert kw["force_bucket"] in self.BUCKETS
            # uniform groups: every member keys to the group bucket
            assert all(
                kw["force_bucket"]
                == (256 if self._counts(i) <= 256 else 1024)
                for i in idxs
            )

    def test_sliced_mode_drops_partial_tail(self):
        from openglue_tpu.data.bucketing import BucketGroupedIndexBatches

        stream = list(range(6))  # batch 4, keep_last: tail of 2
        unsliced = list(
            BucketGroupedIndexBatches(
                iter(stream), self._counts, batch_size=4,
                buckets=self.BUCKETS, drop_last=False,
            )
        )
        assert len(unsliced) == 2 and len(unsliced[1][0]) == 2
        sliced = list(
            BucketGroupedIndexBatches(
                iter(stream), self._counts, batch_size=4,
                buckets=self.BUCKETS, drop_last=False, local_slice=(0, 2),
            )
        )
        # the partial tail would give uneven per-host batches — dropped
        assert len(sliced) == 1 and len(sliced[0][0]) == 2

    def test_loader_batch_sampler_forwards_collate_kwargs(self):
        data = list(range(100))
        batches = [
            ([1, 2, 3], {"force_bucket": 64}),
            ([4, 5], {"force_bucket": 16}),
            [7, 8],  # bare index batch: no kwargs
        ]
        loader = DataLoader(
            data, batch_size=3,
            collate_fn=lambda xs, force_bucket=None: (sum(xs), force_bucket),
            batch_sampler=iter(batches), num_workers=2,
        )
        assert list(loader) == [(6, 64), (9, 16), (15, None)]

    def test_keypoint_count_is_precrop_metadata(self, tmp_path):
        make_megadepth_fixture(tmp_path)  # 50 stored kpts per image
        ds = MegaDepthPairsDatasetFeatures(
            tmp_path, "features_cache", ["scene_a"], target_size=TARGET_CACHED
        )
        assert ds.keypoint_count(0) == 50
        assert ds.keypoint_count(0) == 50  # cached path
        # the loaded (post-crop) counts are smaller, so the pre-crop key
        # always over-covers: choose_bucket(pre) >= choose_bucket(post)
        s = ds[0]
        assert 0 < s["lafs0"].shape[0] <= 50

    def test_force_bucket_overrides_member_counts(self, tmp_path):
        make_megadepth_fixture(tmp_path)
        ds = MegaDepthPairsDatasetFeatures(
            tmp_path, "features_cache", ["scene_a"], target_size=TARGET_CACHED
        )
        samples = [ds[0], ds[1]]
        batch = stack_keypoints_batch(
            samples, target_num_keypoints=1024,
            buckets=(64, 256, 1024), force_bucket=256,
        )
        # members fit bucket 64, but the global grouper said 256
        assert batch.side0.keypoints.shape[1] == 256
        capped = stack_keypoints_batch(
            samples, target_num_keypoints=32, force_bucket=256
        )
        assert capped.side0.keypoints.shape[1] == 32

    def test_resize_keypoint_axis(self, tmp_path):
        from openglue_tpu.data.collate import resize_keypoint_axis

        make_megadepth_fixture(tmp_path)
        ds = MegaDepthPairsDatasetFeatures(
            tmp_path, "features_cache", ["scene_a"], target_size=TARGET_CACHED
        )
        batch = stack_keypoints_batch(
            [ds[0], ds[1]], target_num_keypoints=64, random=False
        )
        up = resize_keypoint_axis(batch, 128)
        assert up.side0.keypoints.shape == (2, 128, 2)
        assert up.side0.descriptors.shape[1] == 128
        assert up.transformation.depth0.shape == (2, 128)
        assert not up.side0.mask[:, 64:].any()
        np.testing.assert_array_equal(
            up.side0.keypoints[:, :64], batch.side0.keypoints
        )
        down = resize_keypoint_axis(batch, 32)
        assert down.side0.keypoints.shape == (2, 32, 2)
        assert down.transformation.depth1.shape == (2, 32)


class TestStructuredFixture:
    """openglue_tpu.data.fixture: the MegaDepth-format synthetic dataset must
    be geometrically learnable — reprojections of persistent surface points
    yield MATCHED GT labels and cross-view descriptor agreement (the round-4
    trainer end-to-end proof runs on this)."""

    def test_gt_consistency(self, tmp_path):
        from openglue_tpu.data.collate import stack_keypoints_batch
        from openglue_tpu.data.fixture import generate_megadepth_fixture
        from openglue_tpu.geometry.gt_matches import generate_gt_matches

        stats = generate_megadepth_fixture(
            tmp_path, scenes=1, images_per_scene=4, points_per_scene=900,
            image_size=(320, 240), descriptor_dim=16,
        )
        assert stats["pairs"] > 0
        ds = MegaDepthPairsDatasetFeatures(
            tmp_path, "SyntheticSphere_640_480", stats["scenes"],
            target_size=(320, 240),
        )
        batch = stack_keypoints_batch(
            [ds[i] for i in range(min(4, len(ds)))],
            target_num_keypoints=512, random=False,
        )
        gt = generate_gt_matches(
            batch.side0.keypoints, batch.side1.keypoints, batch.transformation,
            positive_threshold=2.0, negative_threshold=7.0,
            mask0=batch.side0.mask, mask1=batch.side1.mask,
        )
        m0 = np.asarray(gt["gt_matches0"])
        matched = (m0 >= 0).sum()
        valid = np.asarray(batch.side0.mask).sum()
        assert matched > 0.2 * valid, "fixture lacks learnable correspondences"
        d0 = np.asarray(batch.side0.descriptors)
        d1 = np.asarray(batch.side1.descriptors)
        b, i = np.nonzero(m0 >= 0)
        j = m0[b, i]
        sims = (d0[b, i] * d1[b, j]).sum(-1)
        assert sims.mean() > 0.7

    def test_image_fixture_feeds_homography_dataset(self, tmp_path):
        """generate_image_fixture -> HomographyPairsDataset: textured images
        with enough contrast for corner detection (the round-4 CLI
        pretraining proof runs on this folder)."""
        from openglue_tpu.data.fixture import generate_image_fixture
        from openglue_tpu.data.homography import HomographyPairsDataset

        stats = generate_image_fixture(
            tmp_path / "imgs", num_images=3, image_size=(320, 256), seed=1
        )
        assert stats["num_images"] == 3
        ds = HomographyPairsDataset(
            tmp_path / "imgs", target_size=(160, 120), max_corner_offset=64
        )
        assert len(ds) == 3
        sample = ds[0]
        img0 = np.asarray(sample["image0"])
        assert img0.shape[-2:] == (120, 160) or img0.shape[:2] == (120, 160)
        assert img0.std() > 0.05, "fixture images must be textured"


class TestDeviceDescriptorCache:
    """Device-resident descriptor cache (data/device_cache.py): per-image
    descriptor blocks live in device memory; batches carry row indices, and
    the gathered descriptors must match the host collate exactly (modulo the
    bf16 storage cast)."""

    def _fixture_ds(self, tmp_path, device_descriptors):
        make_megadepth_fixture(tmp_path)
        return MegaDepthPairsDatasetFeatures(
            tmp_path, "features_cache", ["scene_a", "scene_b"],
            target_size=TARGET_CACHED, device_descriptors=device_descriptors,
        )

    def test_gather_matches_host_collate(self, tmp_path):
        import jax.numpy as jnp

        from openglue_tpu.data.collate import stack_keypoints_batch_device
        from openglue_tpu.data.device_cache import DeviceDescriptorCache

        ds_host = self._fixture_ds(tmp_path, device_descriptors=False)
        ds_dev = self._fixture_ds(tmp_path, device_descriptors=True)
        samples_h = [ds_host[i] for i in range(3)]
        samples_d = [ds_dev[i] for i in range(3)]
        # deterministic selection (random=False -> top-score) so both
        # collates pick identical rows
        ref = stack_keypoints_batch(samples_h, target_num_keypoints=64, random=False)
        item = stack_keypoints_batch_device(samples_d, target_num_keypoints=64, random=False)
        assert item.batch.side0.descriptors.shape == (3, 64, 0)

        cache = DeviceDescriptorCache(slots=8, cap=64, dim=32)
        cache.ensure([*item.keys0, *item.keys1], item.blocks)
        d0 = cache.gather(item.keys0, item.index0, item.batch.side0.mask)
        np.testing.assert_allclose(
            np.asarray(d0, np.float32),
            np.asarray(ref.side0.descriptors, np.float32),
            atol=0.01,  # bf16 storage rounding
        )
        # masked rows exactly zero
        assert (np.asarray(d0, np.float32)[~np.asarray(ref.side0.mask)] == 0).all()

    def test_lru_eviction_and_reinstall(self):
        from openglue_tpu.data.device_cache import DeviceDescriptorCache

        rng = np.random.default_rng(0)
        blocks = {("s", f"i{k}"): rng.normal(size=(10, 8)).astype(np.float32) for k in range(4)}
        cache = DeviceDescriptorCache(slots=2, cap=16, dim=8)
        keys = list(blocks)
        cache.ensure(keys[:2], blocks)          # fill both slots
        assert cache.misses == 2
        cache.ensure([keys[0]], blocks)          # hit refreshes LRU
        assert cache.hits == 1
        cache.ensure([keys[2]], blocks)          # evicts keys[1] (LRU)
        assert keys[1] not in cache.slot_of and keys[0] in cache.slot_of
        cache.ensure([keys[1]], blocks)          # reinstall -> miss
        assert cache.misses == 4
        # gathered values match after the churn
        idx = np.arange(10, dtype=np.int32)[None]
        mask = np.ones((1, 10), bool)
        got = np.asarray(cache.gather([keys[1]], idx, mask), np.float32)
        np.testing.assert_allclose(got[0], blocks[keys[1]].astype(np.float32), atol=0.01)

    def test_cap_overflow_raises(self):
        from openglue_tpu.data.device_cache import DeviceDescriptorCache

        cache = DeviceDescriptorCache(slots=2, cap=4, dim=8)
        with pytest.raises(ValueError, match="cap"):
            cache.ensure([("s", "big")], {("s", "big"): np.zeros((9, 8), np.float32)})
