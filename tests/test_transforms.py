"""cv2 transforms: torchvision-semantics golden tests (self-contained — the
environment ships no torchvision; expectations follow its documented math,
mirroring the reference's dataset/tests strategy)."""

import numpy as np

import hi3d_tpu.data.transforms as F


def rand_img(h=37, w=43):
    return np.random.RandomState(0).randint(0, 256, (h, w, 3), np.uint8)


def test_to_tensor_range_and_dtype():
    img = rand_img()
    out = F.to_tensor(img)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0)
    gray = F.to_tensor(img[..., 0])
    assert gray.shape == (37, 43, 1)


def test_center_crop_golden():
    img = np.arange(10 * 12 * 1).reshape(10, 12, 1)
    out = F.center_crop(img, (4, 6))
    # i = round((10-4)/2) = 3, j = round((12-6)/2) = 3
    np.testing.assert_array_equal(out, img[3:7, 3:9])


def test_five_crop_corners_and_center():
    img = rand_img(32, 40)
    tl, tr, bl, br, cc = F.five_crop(img, 16)
    np.testing.assert_array_equal(tl, img[:16, :16])
    np.testing.assert_array_equal(tr, img[:16, 24:])
    np.testing.assert_array_equal(bl, img[16:, :16])
    np.testing.assert_array_equal(br, img[16:, 24:])
    np.testing.assert_array_equal(cc, F.center_crop(img, 16))


def test_pad_and_flips():
    img = rand_img(4, 5)
    out = F.pad(img, (2, 3), fill=7)
    assert out.shape == (10, 9, 3)
    assert (out[:3] == 7).all() and (out[:, :2] == 7).all()
    np.testing.assert_array_equal(out[3:7, 2:7], img)
    np.testing.assert_array_equal(F.hflip(img), img[:, ::-1])
    np.testing.assert_array_equal(F.vflip(img), img[::-1])


def test_resize_shorter_side_semantics():
    img = rand_img(40, 60)
    assert F.resize(img, 20).shape[:2] == (20, 30)
    assert F.resize(img, (15, 25)).shape[:2] == (15, 25)
    assert F.resize(img, 40).shape[:2] == (40, 60)  # already at size → no-op


def test_rotate_expand():
    img = rand_img(20, 30)
    out = F.rotate(img, 90, expand=True)
    assert out.shape[:2] == (30, 20)


def test_adjust_brightness_golden():
    img = np.full((4, 4, 3), 100, np.uint8)
    np.testing.assert_array_equal(F.adjust_brightness(img, 1.5), 150)
    np.testing.assert_array_equal(F.adjust_brightness(img, 3.0), 255)  # clamps


def test_adjust_contrast_golden():
    img = np.full((4, 4, 3), 100, np.uint8)
    # constant image: contrast change is identity (mean == pixel)
    np.testing.assert_array_equal(F.adjust_contrast(img, 0.3), 100)


def test_adjust_saturation_golden():
    img = np.zeros((2, 2, 3), np.uint8)
    img[..., 0] = 200  # pure red
    out = F.adjust_saturation(img, 0.0)  # full desaturation → gray
    gray = round(200 * 0.299)
    assert np.abs(out.astype(int) - gray).max() <= 1


def test_normalize():
    img = F.to_tensor(rand_img())
    out = F.normalize(img, [0.5, 0.5, 0.5], [0.5, 0.5, 0.5])
    np.testing.assert_allclose(out, img * 2.0 - 1.0, rtol=1e-6)


def test_resized_crop():
    img = rand_img(30, 30)
    out = F.resized_crop(img, 5, 5, 20, 20, (10, 10))
    assert out.shape == (10, 10, 3)


def test_ten_crop():
    img = rand_img(32, 40)
    crops = F.ten_crop(img, 16)
    assert len(crops) == 10
    np.testing.assert_array_equal(crops[0], img[:16, :16])
    # second five comes from the h-flipped image
    np.testing.assert_array_equal(crops[5], F.hflip(img)[:16, :16])
    crops_v = F.ten_crop(img, 16, vertical_flip=True)
    np.testing.assert_array_equal(crops_v[5], F.vflip(img)[:16, :16])


def test_adjust_hue_wraparound_and_identity():
    img = rand_img(16, 16)
    same = F.adjust_hue(img, 0.0)
    assert same.shape == img.shape
    # hue is cyclic: ±0.5 shifts land 2/255 apart (int(±0.5·255) mod 256),
    # so the two complementary-hue images nearly coincide
    pos = F.adjust_hue(img, 0.5)
    neg = F.adjust_hue(img, -0.5)
    assert np.mean(np.abs(pos.astype(int) - neg.astype(int))) < 4
    # and a real shift changes the image
    assert np.abs(pos.astype(int) - img.astype(int)).max() > 0
    try:
        F.adjust_hue(img, 0.7)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_adjust_gamma_lut():
    img = rand_img(8, 8)
    out = F.adjust_gamma(img, gamma=1.0)
    np.testing.assert_array_equal(out, img)  # identity at γ=1, gain=1
    dark = F.adjust_gamma(img, gamma=2.0)
    assert dark.astype(int).mean() < img.astype(int).mean()
    expected = ((img[0, 0, 0] / 255.0) ** 2.0) * 255
    assert abs(int(dark[0, 0, 0]) - int(expected)) <= 1


def test_affine_identity_and_translate():
    img = rand_img(24, 24)
    ident = F.affine(img, angle=0, translate=(0, 0), scale=1.0, shear=0)
    np.testing.assert_array_equal(ident, img)
    shifted = F.affine(img, angle=0, translate=(3, 0), scale=1.0, shear=0)
    np.testing.assert_array_equal(shifted[:, 3:], img[:, :-3])


def test_to_grayscale():
    img = rand_img(8, 8)
    g1 = F.to_grayscale(img, 1)
    assert g1.shape == (8, 8, 1)
    g3 = F.to_grayscale(img, 3)
    assert g3.shape == img.shape
    np.testing.assert_array_equal(g3[..., 0], g3[..., 1])


def test_class_api_compose():
    rng = np.random.default_rng(0)
    pipeline = F.Compose([
        F.Resize(20),
        F.CenterCrop(16),
        F.RandomHorizontalFlip(p=0.0),
        F.ToTensor(),
        F.Normalize([0.5, 0.5, 0.5], [0.5, 0.5, 0.5]),
    ])
    out = pipeline(rand_img(40, 60))
    assert out.shape == (16, 16, 3)
    assert out.dtype == np.float32
    assert -1.0 <= out.min() and out.max() <= 1.0


def test_random_classes_deterministic_with_rng():
    img = rand_img(32, 32)
    a = F.RandomCrop(16, rng=np.random.default_rng(7))(img)
    b = F.RandomCrop(16, rng=np.random.default_rng(7))(img)
    np.testing.assert_array_equal(a, b)
    r = F.RandomResizedCrop(8, rng=np.random.default_rng(3))(img)
    assert r.shape == (8, 8, 3)
    rot = F.RandomRotation(10, rng=np.random.default_rng(1))(img)
    assert rot.shape == img.shape
    aff = F.RandomAffine(5, translate=(0.1, 0.1), scale=(0.9, 1.1), shear=5,
                         rng=np.random.default_rng(2))(img)
    assert aff.shape == img.shape
    cj = F.ColorJitter(0.2, 0.2, 0.2, 0.1, rng=np.random.default_rng(4))(img)
    assert cj.shape == img.shape
