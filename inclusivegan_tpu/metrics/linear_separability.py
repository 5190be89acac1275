"""Linear separability — machinery parity with
/root/reference/metrics/linear_separability.py: generate (z, w, image)
triples, score each of 40 CelebA attributes with a classifier, fit a linear
SVM on the latents, accumulate conditional entropy H(Y|Ŷ), report
exp(Σ H) (:103-177).

The reference's 40 frozen per-attribute classifier pickles are external
downloads (URL table :25-64) — unavailable without egress, so the attribute
scorer is an injected callable ``images_255 -> [N, num_attrs] probs``.
Without one, the metric raises with instructions rather than fabricating
numbers."""

import numpy as np

from .metric_base import MetricBase

# attribute names in CelebA order (reference :25-64 keys)
CELEBA_ATTRS = [
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


def conditional_entropy(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """H(Y|Ŷ) in bits for binary arrays (reference :150-166 prob_normalize +
    entropy accumulation)."""
    joint = np.zeros((2, 2), np.float64)
    for t in (0, 1):
        for p in (0, 1):
            joint[t, p] = np.mean((y_true == t) & (y_pred == p))
    joint /= joint.sum()
    h = 0.0
    for p in (0, 1):
        pp = joint[:, p].sum()
        if pp <= 0:
            continue
        for t in (0, 1):
            if joint[t, p] > 0:
                h -= joint[t, p] * np.log2(joint[t, p] / pp)
    return h


class LS(MetricBase):
    def __init__(self, name, num_samples=200000, num_keep=100000,
                 attrib_indices=range(40), minibatch_per_gpu=4,
                 attribute_classifier=None, classifier_weights=None,
                 **kwargs):
        super().__init__(name)
        self.num_samples = num_samples
        self.num_keep = num_keep
        self.attrib_indices = list(attrib_indices)
        self.minibatch = minibatch_per_gpu
        self.attribute_classifier = attribute_classifier
        self.classifier_weights = classifier_weights

    def _evaluate(self, sampler, dataset_args, data_dir, **kwargs):
        if self.attribute_classifier is None:
            # default scorer: the trained 40-head CNN (one npz instead of
            # the reference's 40 downloadable pickles, :25-64); warns and
            # suffixes results when only random-init weights exist
            from ..models.feature_nets import CelebAAttrClassifier
            clf = CelebAAttrClassifier(weights_path=self.classifier_weights)
            if clf.mode != "pretrained":
                # same impossible-to-miss tagging as mode_counts.py:32
                self._report_result(1.0, suffix="_untrained_classifier",
                                    fmt="-1.0f")
            self.attribute_classifier = clf
        from sklearn import svm
        import jax
        import jax.numpy as jnp

        G = sampler.G
        rnd = np.random.RandomState(123)
        zs, ws, probs = [], [], []
        done = 0
        while done < self.num_samples:
            take = min(self.minibatch * 32, self.num_samples - done)
            z = rnd.randn(take, G.mapping.latent_size).astype(np.float32)
            w = np.asarray(G.mapping.apply(sampler.gs_params["mapping"],
                                           jnp.asarray(z)))
            imgs = sampler.run(z)
            probs.append(self.attribute_classifier(imgs))
            zs.append(z)
            ws.append(w[:, 0] if w.ndim == 3 else w)
            done += take
        zs, ws, probs = map(np.concatenate, (zs, ws, probs))

        conditional_entropies = {"z": [], "w": []}
        for attr_idx in self.attrib_indices:
            p = probs[:, attr_idx]
            keep = np.argsort(np.abs(p - 0.5))[-self.num_keep:]
            y = (p[keep] > 0.5).astype(np.int32)
            if len(np.unique(y)) < 2:
                # a degenerate attribute (scorer puts every sample on one
                # side) is perfectly predictable by a constant: H(Y|Y^)=0
                for space in ("z", "w"):
                    conditional_entropies[space].append(0.0)
                continue
            for space, latents in (("z", zs), ("w", ws)):
                x = latents[keep]
                clf = svm.LinearSVC(C=0.1, dual="auto")
                clf.fit(x, y)
                pred = clf.predict(x).astype(np.int32)
                conditional_entropies[space].append(conditional_entropy(y, pred))
        for space in ("z", "w"):
            score = 2 ** np.sum(conditional_entropies[space])
            self._report_result(float(score), suffix=f"_{space}")
