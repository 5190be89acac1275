#!/usr/bin/env python3
"""Generate a synthetic CelebA substitute: aligned 178x218 face jpgs +
``Anno/list_attr_celeba.txt`` with all 40 binary attributes.

This container has no egress, so the real CelebA aligned images (reference
README.md:61-69) cannot be downloaded. This renders procedural "faces"
whose 40 attributes are visually grounded (Eyeglasses draws glasses,
Black_Hair colors the hair, Smiling bends the mouth, ...), in the exact
directory layout `dataset_tool.py create_celeba` consumes unmodified
(reference dataset_tool.py:447-486 crop semantics; attr txt format from
celeba/Anno/list_attr_celeba.txt, training_loop.py:175) — so the full
CelebA-128 pipeline (training incl. --attr-interesting minority inclusion,
fid30k/pr50k3/ppl metrics, LS's 40-attribute scorer, IvOM projection) runs
end-to-end without external data.

Usage:
  python scripts/make_synthetic_celeba.py --out /tmp/exp/celeba --num-images 30000
  python dataset_tool.py create_celeba /tmp/exp/datasets/celeba_synth_30k /tmp/exp/celeba
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# CelebA attribute order (metrics/linear_separability.py::CELEBA_ATTRS)
ATTRS = [
    "5_o_Clock_Shadow", "Arched_Eyebrows", "Attractive", "Bags_Under_Eyes",
    "Bald", "Bangs", "Big_Lips", "Big_Nose", "Black_Hair", "Blond_Hair",
    "Blurry", "Brown_Hair", "Bushy_Eyebrows", "Chubby", "Double_Chin",
    "Eyeglasses", "Goatee", "Gray_Hair", "Heavy_Makeup", "High_Cheekbones",
    "Male", "Mouth_Slightly_Open", "Mustache", "Narrow_Eyes", "No_Beard",
    "Oval_Face", "Pale_Skin", "Pointy_Nose", "Receding_Hairline",
    "Rosy_Cheeks", "Sideburns", "Smiling", "Straight_Hair", "Wavy_Hair",
    "Wearing_Earrings", "Wearing_Hat", "Wearing_Lipstick",
    "Wearing_Necklace", "Wearing_Necktie", "Young",
]
A = {name: i for i, name in enumerate(ATTRS)}

W, H = 178, 218
_YY, _XX = np.mgrid[0:H, 0:W].astype(np.float32)

HAIR_COLORS = {
    "Black_Hair": (28, 24, 22), "Blond_Hair": (205, 172, 110),
    "Brown_Hair": (110, 72, 42), "Gray_Hair": (168, 168, 170),
}


def sample_attrs(rnd):
    """Binary attribute vector with CelebA-flavored marginals and the hard
    consistency constraints the renderer needs (exclusive hair colors,
    Bald excludes Bangs/hair colors, Male gates makeup/beards...)."""
    a = np.zeros(40, np.int8)
    male = rnd.rand() < 0.42
    a[A["Male"]] = male
    young = rnd.rand() < 0.77
    a[A["Young"]] = young

    a[A["Bald"]] = male and rnd.rand() < 0.05
    a[A["Wearing_Hat"]] = (not a[A["Bald"]]) and rnd.rand() < 0.05
    if not a[A["Bald"]]:
        # renormalize (p depends on male/young)
        probs = np.array([0.30, 0.18 if not male else 0.06, 0.25,
                          0.04 if young else 0.35, 0.08])
        probs /= probs.sum()
        hair = rnd.choice(["Black_Hair", "Blond_Hair", "Brown_Hair",
                           "Gray_Hair", "none"], p=probs)
        if hair != "none":
            a[A[hair]] = 1
        a[A["Bangs"]] = rnd.rand() < 0.15
        a[A["Receding_Hairline"]] = (not a[A["Bangs"]]) and rnd.rand() < (
            0.18 if male else 0.05)
        if rnd.rand() < 0.5:
            a[A["Straight_Hair"]] = 1
        else:
            a[A["Wavy_Hair"]] = 1

    beard_ok = male and not a[A["Wearing_Hat"]]
    a[A["Mustache"]] = beard_ok and rnd.rand() < 0.18
    a[A["Goatee"]] = beard_ok and rnd.rand() < 0.15
    a[A["5_o_Clock_Shadow"]] = beard_ok and rnd.rand() < 0.25
    a[A["Sideburns"]] = beard_ok and rnd.rand() < 0.15
    a[A["No_Beard"]] = not (a[A["Mustache"]] or a[A["Goatee"]]
                            or a[A["5_o_Clock_Shadow"]])

    a[A["Heavy_Makeup"]] = (not male) and rnd.rand() < 0.55
    a[A["Wearing_Lipstick"]] = (not male) and (
        a[A["Heavy_Makeup"]] or rnd.rand() < 0.35)
    a[A["Rosy_Cheeks"]] = (a[A["Heavy_Makeup"]] and rnd.rand() < 0.35) or \
        rnd.rand() < 0.04

    a[A["Eyeglasses"]] = rnd.rand() < 0.12
    a[A["Narrow_Eyes"]] = rnd.rand() < 0.15
    a[A["Bags_Under_Eyes"]] = rnd.rand() < (0.12 if young else 0.45)
    a[A["Arched_Eyebrows"]] = (not male) and rnd.rand() < 0.45
    a[A["Bushy_Eyebrows"]] = male and rnd.rand() < 0.30

    a[A["Big_Nose"]] = rnd.rand() < (0.30 if male else 0.12)
    a[A["Pointy_Nose"]] = (not a[A["Big_Nose"]]) and rnd.rand() < 0.30
    a[A["Big_Lips"]] = rnd.rand() < 0.25
    a[A["Smiling"]] = rnd.rand() < 0.48
    a[A["Mouth_Slightly_Open"]] = rnd.rand() < 0.45

    a[A["Chubby"]] = rnd.rand() < (0.08 if young else 0.25)
    a[A["Double_Chin"]] = a[A["Chubby"]] and rnd.rand() < 0.6
    a[A["Oval_Face"]] = (not a[A["Chubby"]]) and rnd.rand() < 0.30
    a[A["High_Cheekbones"]] = rnd.rand() < 0.45
    a[A["Pale_Skin"]] = rnd.rand() < 0.10
    a[A["Blurry"]] = rnd.rand() < 0.05

    a[A["Wearing_Earrings"]] = (not male) and rnd.rand() < 0.25
    a[A["Wearing_Necklace"]] = (not male) and rnd.rand() < 0.15
    a[A["Wearing_Necktie"]] = male and rnd.rand() < 0.15

    # composite attrs with visual correlates + noise
    glam = (a[A["Heavy_Makeup"]] + a[A["Smiling"]] + young
            + a[A["High_Cheekbones"]])
    a[A["Attractive"]] = glam + rnd.rand() * 2 > 2.5
    return a


def _ellipse(cy, cx, ry, rx, soft=1.5):
    d = ((_YY - cy) / ry) ** 2 + ((_XX - cx) / rx) ** 2
    return np.clip((1.0 - d) * soft + 0.5, 0.0, 1.0)


def _paint(img, mask, color):
    img += mask[..., None] * (np.asarray(color, np.float32) - img)


def render_face(a, rnd):
    img = np.empty((H, W, 3), np.float32)
    img[:] = rnd.uniform(40, 215, 3)  # flat backdrop
    img += rnd.uniform(-12, 12) * ((_YY / H) - 0.5)[..., None]

    cx = 89 + rnd.uniform(-4, 4)
    cy = 112 + rnd.uniform(-4, 4)
    fw = rnd.uniform(46, 54) * (1.18 if a[A["Chubby"]] else 1.0) \
        * (0.88 if a[A["Oval_Face"]] else 1.0) * (1.06 if a[A["Male"]] else 1.0)
    fh = rnd.uniform(62, 72)

    skin = np.array([224, 184, 156], np.float32) if a[A["Pale_Skin"]] \
        else np.array([rnd.uniform(140, 215)] * 3, np.float32) * \
        np.array([1.0, 0.80, 0.66])
    if a[A["Young"]]:
        skin = skin * 0.9 + np.array([236, 200, 172]) * 0.1

    # hair behind the head (a larger ellipse), unless bald
    hair_color = None
    for name, col in HAIR_COLORS.items():
        if a[A[name]]:
            hair_color = np.asarray(col, np.float32)
    if hair_color is None and not a[A["Bald"]]:
        hair_color = np.asarray((60, 45, 35), np.float32)  # dark fallback
    if not a[A["Bald"]] and hair_color is not None:
        hr = 1.25 if not a[A["Receding_Hairline"]] else 1.08
        wave = (6.0 * np.sin(_YY / 9.0 + rnd.uniform(0, 6))
                if a[A["Wavy_Hair"]] else 0.0)
        hair_mask = _ellipse(cy - 6, cx + (wave if a[A["Wavy_Hair"]] else 0),
                             fh * hr, fw * 1.3)
        _paint(img, hair_mask, hair_color + rnd.uniform(-10, 10, 3))

    # head
    head = _ellipse(cy, cx, fh, fw)
    _paint(img, head, skin + rnd.uniform(-8, 8, 3))
    if a[A["Double_Chin"]]:
        _paint(img, _ellipse(cy + fh * 0.92, cx, fh * 0.18, fw * 0.55),
               skin * 0.96)

    # forehead hair: bangs fringe or receding crown patch of skin
    if not a[A["Bald"]] and hair_color is not None:
        top = cy - fh * (0.45 if a[A["Bangs"]] else 0.78)
        if a[A["Receding_Hairline"]]:
            top = cy - fh * 0.95
        fringe = (head > 0.5) & (_YY < top)
        _paint(img, fringe.astype(np.float32), hair_color)

    ey = cy - fh * 0.15
    ex = fw * 0.42
    eh = 4.5 * (0.45 if a[A["Narrow_Eyes"]] else 1.0)
    for sx in (-1, 1):
        # brows
        bh = 2.2 * (2.0 if a[A["Bushy_Eyebrows"]] else 1.0)
        by = ey - 13 - (3 if a[A["Arched_Eyebrows"]] else 0)
        _paint(img, _ellipse(by, cx + sx * ex, bh, 11),
               (40, 30, 25) if not a[A["Gray_Hair"]] else (150, 150, 150))
        # eye white + iris
        _paint(img, _ellipse(ey, cx + sx * ex, eh, 9.5), (245, 245, 245))
        _paint(img, _ellipse(ey, cx + sx * ex, min(eh, 3.4), 3.4),
               (rnd.uniform(30, 90), rnd.uniform(40, 90), rnd.uniform(40, 120)))
        if a[A["Bags_Under_Eyes"]]:
            _paint(img, _ellipse(ey + 9, cx + sx * ex, 2.2, 9) * 0.5,
                   skin * 0.72)
        if a[A["High_Cheekbones"]]:
            _paint(img, _ellipse(ey + 20, cx + sx * (ex + 4), 5, 9) * 0.35,
                   np.minimum(skin * 1.22, 255))
        if a[A["Rosy_Cheeks"]]:
            _paint(img, _ellipse(ey + 22, cx + sx * ex, 6, 8) * 0.45,
                   (233, 150, 150))
        if a[A["Heavy_Makeup"]]:
            _paint(img, _ellipse(ey - 5, cx + sx * ex, 2.0, 10) * 0.6,
                   (90, 60, 110))
        if a[A["Wearing_Earrings"]]:
            _paint(img, _ellipse(cy + fh * 0.12, cx + sx * fw * 0.98, 3, 3),
                   (250, 215, 80))
        if a[A["Sideburns"]]:
            _paint(img, _ellipse(cy + fh * 0.25, cx + sx * fw * 0.82,
                                 fh * 0.22, 5), (55, 45, 38))

    if a[A["Eyeglasses"]]:
        for sx in (-1, 1):
            ring = np.clip(_ellipse(ey, cx + sx * ex, 10.5, 13)
                           - _ellipse(ey, cx + sx * ex, 7.5, 10), 0, 1)
            _paint(img, ring, (25, 25, 28))
        bridge = ((np.abs(_YY - ey) < 1.6)
                  & (np.abs(_XX - cx) < ex - 9)).astype(np.float32)
        _paint(img, bridge, (25, 25, 28))

    # nose
    ny = cy + fh * 0.18
    nw = 7.5 * (1.65 if a[A["Big_Nose"]] else 1.0) \
        * (0.75 if a[A["Pointy_Nose"]] else 1.0)
    nh = 11 * (1.25 if a[A["Pointy_Nose"]] else 1.0)
    _paint(img, _ellipse(ny, cx, nh, nw) * 0.8, skin * 0.82)

    # mouth
    my = cy + fh * 0.45
    lip_h = 3.2 * (1.9 if a[A["Big_Lips"]] else 1.0)
    lip_c = (200, 60, 70) if a[A["Wearing_Lipstick"]] else skin * 0.62
    smile = 5.0 if a[A["Smiling"]] else (-2.0 if rnd.rand() < 0.3 else 0.0)
    # image +y points DOWN: a smile bends the mouth corners up (smaller y)
    # and the center down, i.e. center offset +smile/2, corners -smile/2
    curve = my + smile * (0.5 - ((_XX - cx) / 16.0) ** 2)
    mouth = (np.abs(_YY - curve) < lip_h) & (np.abs(_XX - cx) < 16)
    _paint(img, mouth.astype(np.float32), lip_c)
    if a[A["Mouth_Slightly_Open"]]:
        gap = (np.abs(_YY - curve) < lip_h * 0.35) & (np.abs(_XX - cx) < 12)
        _paint(img, gap.astype(np.float32), (70, 25, 30))
    if a[A["Smiling"]]:
        _paint(img, _ellipse(my - 2, cx, 1.2, 14) * 0.3, skin * 0.9)

    # facial hair
    if a[A["Mustache"]]:
        _paint(img, _ellipse(my - lip_h - 3.5, cx, 3.0, 15), (50, 38, 30))
    if a[A["Goatee"]]:
        _paint(img, _ellipse(my + lip_h + 7, cx, 6, 9), (50, 38, 30))
    if a[A["5_o_Clock_Shadow"]]:
        jaw = np.clip(_ellipse(cy + fh * 0.45, cx, fh * 0.5, fw * 0.85)
                      - _ellipse(cy + fh * 0.30, cx, fh * 0.33, fw * 0.62),
                      0, 1)
        _paint(img, jaw * 0.30, skin * 0.60)

    # hat / neckwear
    if a[A["Wearing_Hat"]]:
        hat = ((_YY > cy - fh * 1.35) & (_YY < cy - fh * 0.62)
               & (np.abs(_XX - cx) < fw * 1.25)).astype(np.float32)
        _paint(img, hat, (rnd.uniform(20, 120), rnd.uniform(20, 120),
                          rnd.uniform(20, 160)))
    neck_y = cy + fh + 8
    _paint(img, ((_YY > neck_y - 10) & (np.abs(_XX - cx) < fw * 0.38)
                 ).astype(np.float32), skin * 0.95)
    if a[A["Wearing_Necklace"]]:
        arc = np.abs((_YY - neck_y) - 12 * (1 - ((_XX - cx) / (fw * 0.5)) ** 2))
        _paint(img, ((arc < 2) & (np.abs(_XX - cx) < fw * 0.5)
                     ).astype(np.float32), (240, 220, 90))
    if a[A["Wearing_Necktie"]]:
        tie = ((_YY > neck_y) & (np.abs(_XX - cx) < 7)).astype(np.float32)
        _paint(img, tie, (120, 20, 30))

    img += rnd.normal(0, 3.0, img.shape).astype(np.float32)
    if a[A["Blurry"]]:
        from scipy import ndimage
        img = ndimage.gaussian_filter(img, (2.2, 2.2, 0))
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-images", type=int, default=30000)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--quality", type=int, default=92)
    args = ap.parse_args()

    from PIL import Image

    img_dir = os.path.join(args.out, "img_align_celeba")
    anno_dir = os.path.join(args.out, "Anno")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(anno_dir, exist_ok=True)

    rnd = np.random.RandomState(args.seed)
    lines = [str(args.num_images), " ".join(ATTRS)]
    for i in range(args.num_images):
        a = sample_attrs(rnd)
        img = render_face(a, rnd)
        name = f"{i + 1:06d}.jpg"
        Image.fromarray(img).save(os.path.join(img_dir, name),
                                  quality=args.quality)
        lines.append(name + " " + " ".join("1" if v else "-1" for v in a))
        if (i + 1) % 2000 == 0:
            print(f"{i + 1}/{args.num_images}", flush=True)

    with open(os.path.join(anno_dir, "list_attr_celeba.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.num_images} jpgs + Anno/list_attr_celeba.txt "
          f"under {args.out}")


if __name__ == "__main__":
    main()
