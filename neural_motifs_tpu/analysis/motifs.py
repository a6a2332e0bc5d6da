"""Offline motif ("meme") mining over GT scene graphs — the paper's
analysis tool (equivalent of reference misc/motifs.py).

Each image is a bag of triple tokens (sub_class, predicate, obj_class).
Iteratively: count unigram/bigram co-occurrence within images, compute a
PMI-style score for each token pair, promote high-count high-PMI pairs to
new composite motif tokens, and greedily merge their occurrences in every
image. After N rounds the surviving composite tokens are the dataset's
recurring motifs.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class MotifMiner:
    count_threshold: int = 50
    pmi_threshold: float = 10.0
    iterations: int = 25
    # token tables: base tokens are (s, p, o) triples; composites are pairs
    # of token ids
    id_key: dict = field(default_factory=dict)
    key_id: dict = field(default_factory=dict)
    meme_score: dict = field(default_factory=dict)

    def _intern(self, key) -> int:
        if key not in self.key_id:
            i = len(self.id_key)
            self.id_key[i] = key
            self.key_id[key] = i
        return self.key_id[key]

    def token_str(self, tid: int, classes, predicates) -> str:
        key = self.id_key[tid]
        if len(key) == 2:  # composite
            return (self.token_str(key[0], classes, predicates) + " & " +
                    self.token_str(key[1], classes, predicates))
        s, p, o = key
        return f"{classes[s]}--{predicates[p]}-->{classes[o]}"

    def mine(self, gt_classes_list, relationships_list, verbose: bool = False):
        """Returns a list of (motif_id, score) discovered composites."""
        dataset = []
        for cls, rels in zip(gt_classes_list, relationships_list):
            item = [self._intern((int(cls[s]), int(p), int(cls[o])))
                    for (s, o, p) in rels]
            dataset.append(item)

        discovered = []
        for it in range(self.iterations):
            unigrams = defaultdict(float)
            unigrams_ori = defaultdict(float)
            bigrams = defaultdict(float)
            total_pairs = 0
            for item in dataset:
                for j, k1 in enumerate(item):
                    unigrams_ori[k1] += 1
                    for k2 in item[j + 1:]:
                        jkey = (k1, k2) if k1 > k2 else (k2, k1)
                        unigrams[k1] += 1
                        unigrams[k2] += 1
                        bigrams[jkey] += 1
                        total_pairs += 1
            if total_pairs == 0:
                break

            scored = []
            for jkey, v in bigrams.items():
                denom = (unigrams[jkey[0]] / total_pairs) ** 2
                pmi = (v / total_pairs) / max(denom, 1e-12)
                if (v > self.count_threshold
                        and unigrams_ori[jkey[0]] > self.count_threshold
                        and unigrams_ori[jkey[1]] > self.count_threshold
                        and pmi > self.pmi_threshold):
                    scored.append((pmi, jkey, v))
            scored.sort(key=lambda x: -x[0])

            used = set()
            new_memes = set()
            for pmi, jkey, v in scored:
                if jkey[0] in used or jkey[1] in used:
                    continue
                used.update(jkey)
                new_memes.add(jkey)
                self.meme_score[jkey] = pmi
                mid = self._intern(jkey)
                discovered.append((mid, pmi))
                if verbose:
                    print(f"iter {it}: motif {jkey} pmi={pmi:.2f} count={v}")
            if not new_memes:
                break

            # greedily merge the best-scoring pair occurrences per image
            new_dataset = []
            for item in dataset:
                item = list(item)
                while True:
                    best, best_score = None, 0.0
                    for j, k1 in enumerate(item):
                        for j2 in range(j + 1, len(item)):
                            k2 = item[j2]
                            jkey = (k1, k2) if k1 > k2 else (k2, k1)
                            sc = self.meme_score.get(jkey, 0.0)
                            if sc > best_score:
                                best, best_score = (j, j2), sc
                    if best is None:
                        break
                    j, j2 = best
                    k1, k2 = item[j], item[j2]
                    jkey = (k1, k2) if k1 > k2 else (k2, k1)
                    merged = self.key_id[jkey]
                    item = [merged if jj == j else t
                            for jj, t in enumerate(item) if jj != j2]
                new_dataset.append(item)
            dataset = new_dataset
        return discovered


def mine_motifs(dataset, **kw):
    """Convenience: mine motifs from a VG/SyntheticVG-style dataset."""
    miner = MotifMiner(**kw)
    found = miner.mine(dataset.gt_classes, dataset.relationships)
    return miner, found


def _cli(argv=None):
    """Mine motifs from the training split and print the top composites
    (reference misc/motifs.py run as a script)."""
    import argparse

    p = argparse.ArgumentParser(description="PMI motif mining over GT graphs")
    p.add_argument("-top", type=int, default=40)
    p.add_argument("-iterations", type=int, default=25)
    p.add_argument("-count_threshold", type=int, default=50)
    p.add_argument("-pmi_threshold", type=float, default=10.0)
    a = p.parse_args(argv)
    try:
        from neural_motifs_tpu.data.visual_genome import VG
        ds = VG("train")
    except FileNotFoundError as e:
        print(f"[motifs] {e}\nFalling back to SyntheticVG.")
        from neural_motifs_tpu.data.synthetic import SyntheticVG
        ds = SyntheticVG(256, "train")
    miner, found = mine_motifs(
        ds, iterations=a.iterations, count_threshold=a.count_threshold,
        pmi_threshold=a.pmi_threshold)
    found.sort(key=lambda kv: -kv[1])
    for tid, score in found[:a.top]:
        print(f"{score:8.2f}  "
              f"{miner.token_str(tid, ds.ind_to_classes, ds.ind_to_predicates)}")
    if not found:
        print("no motifs above thresholds (expected on random synthetic data)")


if __name__ == "__main__":
    _cli()
