"""Checkpoint converter: a synthetic reference-shaped state_dict must map
onto trees with exactly the structure and shapes of our initialized models."""

import jax
import numpy as np
import pytest

from lidiff_tpu.config import finalize_config
from lidiff_tpu.models.diffusion import DiffusionTask
from lidiff_tpu.models.refine import RefineTask
from lidiff_tpu.tools.convert_checkpoint import (convert_diffusion,
                                                 convert_refine, cube_perm)

pytestmark = pytest.mark.slow

CFG = {
    "experiment": {"id": "conv"},
    "data": {"data_dir": "", "resolution": 0.25, "dataloader": "KITTI",
             "split": "train", "train": [], "validation": [], "test": [],
             "num_points": 256, "max_range": 50.0, "dataset_norm": False,
             "std_axis_norm": False},
    "train": {"uncond_prob": 0.1, "uncond_w": 6.0, "n_gpus": 1,
              "num_workers": 0, "max_epoch": 1, "lr": 1e-4, "batch_size": 1,
              "decay_lr": 1e-4, "up_factor": 6},
    "diff": {"beta_start": 3.5e-5, "beta_end": 0.007, "beta_func": "linear",
             "t_steps": 10, "s_steps": 2, "reg_weight": 5.0},
    "model": {"out_dim": 96},
    "tpu": {"full_capacities": [256, 128, 128, 128, 128],
            "part_capacities": [64, 64, 64, 64, 64]},
}


def _fake_sd_from_tree(params, stats, module_prefixes):
    """Generate a reference-style state_dict whose keys/shapes invert the
    converter's mapping — built from the converter's own spec so the test
    validates structural agreement with OUR model trees."""
    # Walk our param tree and synthesize the reference keys the converter
    # reads. We reuse the converter in reverse bygenerating every key it
    # accesses via a recording dict.
    class Recorder(dict):
        def __init__(self):
            super().__init__()
            self.requested = []

        def __getitem__(self, k):
            self.requested.append(k)
            # shapes don't matter for structure test; return marker
            return np.zeros((1,))

    return Recorder()


def test_cube_perm_roundtrip():
    p = cube_perm(3, "x")
    assert sorted(p.tolist()) == list(range(27))
    # z-fastest source is identity
    np.testing.assert_array_equal(cube_perm(3, "z"), np.arange(27))
    p2 = cube_perm(2, "x")
    assert sorted(p2.tolist()) == list(range(8))


def _shapes(tree):
    return jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), tree)


def _synth_sd_for(convert_fn, ours_params, ours_stats):
    """Two-pass synthesis: record requested keys, then produce arrays with
    shapes derived from our own tree so conversion reproduces it exactly."""
    rec = _fake_sd_from_tree(None, None, None)
    try:
        convert_fn(rec)
    except Exception:
        pass
    # now build a real dict with correct shapes by mapping converted paths:
    # run again with arrays shaped to our tree via name-guided inference
    sd = {}
    flat_ours = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
                 jax.tree_util.tree_leaves_with_path(ours_params)}
    flat_stats = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
                  jax.tree_util.tree_leaves_with_path(ours_stats)}
    # The converter output paths follow our naming; emulate by converting a
    # placeholder dict where each requested key gets the shape needed:
    # linear weights -> transpose of ours; conv kernels -> inverse tap perm.
    # Easiest robust approach: build sd by inverting each requested name
    # against a *converted* index. Rather than reimplementing, we rely on
    # the structural test below with shape-faithful placeholders.
    return rec.requested


def test_diffusion_converter_structure():
    cfg = finalize_config(dict(CFG))
    task = DiffusionTask(cfg)
    variables = task.init(jax.random.PRNGKey(0), 1, 256, 64)
    ours_p = variables["params"]
    ours_s = variables["batch_stats"]

    requested = _synth_sd_for(convert_diffusion, ours_p, ours_s)
    assert requested, "converter requested no keys"

    # build shape-correct fake state_dict by inverting the mapping rules
    sd = {}
    import re
    flat = {}
    for p, v in jax.tree_util.tree_leaves_with_path(ours_p):
        flat["/".join(str(getattr(k, 'key', k)) for k in p)] = np.asarray(v)
    # conversion pass with real arrays requires correct shapes per torch
    # naming; synthesize via our tree using the converter's own mapping:
    params2, stats2 = convert_diffusion(_ShapedSD(ours_p, ours_s))
    assert jax.tree_util.tree_structure(_shapes(params2)) == \
        jax.tree_util.tree_structure(_shapes(ours_p))
    # shapes must agree leaf by leaf
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(_shapes(params2)),
            jax.tree_util.tree_leaves_with_path(_shapes(ours_p))):
        assert a == b, (jax.tree_util.keystr(pa), a, b)


def test_refine_converter_structure():
    cfg = finalize_config(dict(CFG))
    task = RefineTask(cfg)
    variables = task.init(jax.random.PRNGKey(0), 1, 256)
    params2, stats2 = convert_refine(
        _ShapedSD(variables["params"], variables["batch_stats"],
                  refine=True))
    assert jax.tree_util.tree_structure(_shapes(params2)) == \
        jax.tree_util.tree_structure(_shapes(variables["params"]))


class _ShapedSD:
    """A state_dict stand-in that serves arrays of the RIGHT shape for any
    requested reference key, derived from our own initialized tree — by
    replaying the converter's own access patterns in a first recording pass
    and pairing them with the converter's output slots in a second pass.

    Simpler equivalent: serve arrays shaped by the reference layer rules
    (Linear [out,in], conv [K,ci,co], BN [c]) inferred from our tree via the
    mirrored module specs. We exploit that the converter's put() targets
    exactly our tree paths, so we can pre-walk our tree to know each slot's
    shape; the access order of sd keys matches put order.
    """

    def __init__(self, ours_params, ours_stats, refine=False):
        self.ours_params = ours_params
        self.ours_stats = ours_stats
        self.refine = refine
        # pre-walk: map access sequence by running a recording pass
        from lidiff_tpu.tools.convert_checkpoint import (convert_diffusion,
                                                         convert_refine)
        fn = convert_refine if refine else convert_diffusion

        order = []

        class Rec(dict):
            def __getitem__(s, k):
                order.append(k)
                return np.zeros((1,), np.float32)

        try:
            fn(Rec())
        except Exception:
            pass
        self._keys = order

        # second pass: shape inference from our tree by running fn with a
        # dict that maps each key to a shaped array
        self._shaped = {}
        flat_p = {self._path(p): np.asarray(v) for p, v in
                  jax.tree_util.tree_leaves_with_path(ours_params)}
        flat_s = {self._path(p): np.asarray(v) for p, v in
                  jax.tree_util.tree_leaves_with_path(ours_stats)}
        self.flat_p = flat_p
        self.flat_s = flat_s

    @staticmethod
    def _path(p):
        return "/".join(str(getattr(k, "key", k)) for k in p)

    def __contains__(self, k):
        return True

    def keys(self):
        return self._keys

    def __iter__(self):
        return iter(self._keys)

    def startswith(self, *_):
        return False

    def __getitem__(self, k):
        # shape rules by suffix
        import re
        if k.endswith(".running_mean") or k.endswith(".running_var"):
            c = self._bn_channels(k)
            return np.zeros((c,), np.float32)
        if k.endswith(".weight") and (".net." in k or "stem" in k
                                      or "downsample" in k):
            # BN weight inside conv blocks
            c = self._bn_channels(k)
            return np.ones((c,), np.float32)
        if k.endswith(".kernel"):
            return self._conv_kernel(k)
        if k.endswith(".weight"):
            return self._linear_weight(k)
        if k.endswith(".bias"):
            c = self._bias_channels(k)
            return np.zeros((c,), np.float32)
        raise KeyError(k)

    # --- shape inference helpers driven by our own tree -----------------
    def _lookup(self, fragments, leaf):
        for path, v in self.flat_p.items():
            segs = path.split("/")
            if all(f in segs for f in fragments) and segs[-1] == leaf:
                return v
        for path, v in self.flat_s.items():
            segs = path.split("/")
            if all(f in segs for f in fragments) and segs[-1] == leaf:
                return v
        raise KeyError((fragments, leaf))

    def _frag_for(self, k):
        """Map a reference key prefix to identifying fragments of our
        tree path."""
        den = [] if self.refine else ["denoiser"]
        mapping = [
            ("partial_enc.stem", ["partial_enc", "Stem_0"]),
            ("model.stem", den + ["Stem_0"]),
            ("model_refine.stem", ["Stem_0"]),
        ]
        import re
        m = re.match(r"(partial_enc|model_refine|model)\.stage(\d)", k)
        if m:
            root = {"partial_enc": ["partial_enc"],
                    "model": den,
                    "model_refine": []}[m.group(1)]
            return root + [f"DownStage_{int(m.group(2)) - 1}"], k
        m = re.match(r"(model_refine|model)\.up(\d)", k)
        if m and "latemp" not in k and "_temp" not in k \
                and "latent" not in k:
            root = {"model": den, "model_refine": []}[m.group(1)]
            return root + [f"UpStage_{int(m.group(2)) - 1}"], k
        for pre, frag in mapping:
            if k.startswith(pre):
                return frag, k
        return None, k

    def _position_frags(self, k):
        """Locate the sub-block fragments within a stage."""
        frags, _ = self._frag_for(k)
        if frags is None:
            return None
        import re
        if ".stem." in k:
            idx = int(k.split(".stem.")[1].split(".")[0])
            sub = "ConvBNReLU_0" if idx <= 1 else "ConvBNReLU_1"
            return frags + [sub]
        m = re.search(r"\.stage\d\.(\d)", k)
        if m:
            j = int(m.group(1))
            if j == 0:
                return frags + ["ConvBNReLU_0"]
            return frags + [f"ResidualBlock_{j - 1}"]
        m = re.search(r"\.up\d\.(\d)(?:\.(\d))?", k)
        if m:
            j = int(m.group(1))
            if j == 0:
                return frags + ["DeconvBNReLU_0"]
            jj = int(m.group(2))
            return frags + [f"ResidualBlock_{jj}"]
        return frags

    def _conv_kernel(self, k):
        frags = self._position_frags(k)
        if "downsample" in k:
            v = self._lookup(frags + ["Dense_0"], "kernel")
            return v
        # which conv inside the block?
        import re as _re
        if _re.search(r"\.up\d\.0\.net\.0\.", k):
            leaf_frag = "SparseConvTranspose_0"
        elif ".net.3" in k:
            leaf_frag = "SparseConv_1"
        else:
            leaf_frag = "SparseConv_0"
        v = self._lookup(frags + [leaf_frag], "kernel")
        # our [K, ci, co] -> inverse tap permutation for the fake source
        perm = cube_perm(3 if v.shape[0] == 27 else 2, "x")
        inv = np.argsort(perm)
        return v[inv]

    def _bn_channels(self, k):
        return self._bn_array(k).shape[0]

    def _bn_array(self, k):
        frags = self._position_frags(k)
        if "downsample" in k:
            return self._lookup(frags + ["MaskedBatchNorm_2"], "scale")
        if ".net.4" in k:
            return self._lookup(frags + ["MaskedBatchNorm_1"], "scale")
        return self._lookup(frags + ["MaskedBatchNorm_0"], "scale")

    def _linear_weight(self, k):
        v = self._linear_ours(k, "kernel")
        return v.T

    def _bias_channels(self, k):
        if any(t in k for t in ["latent", "latemp", "_temp", "last"]):
            return self._linear_ours(k, "bias").shape[0]
        return self._bn_channels(k)

    def _linear_ours(self, k, leaf):
        import re
        gate_map = {
            "latent_stage1": ["gate_s1", "latent"],
            "latent_stage2": ["gate_s2", "latent"],
            "latent_stage3": ["gate_s3", "latent"],
            "latent_stage4": ["gate_s4", "latent"],
            "latent_up1": ["gate_u1", "latent"],
            "latent_up2": ["gate_u2", "latent"],
            "latent_up3": ["gate_u3", "latent"],
            "latent_up4": ["gate_u4", "latent"],
            "stage1_temp": ["gate_s1", "temp"],
            "stage2_temp": ["gate_s2", "temp"],
            "stage3_temp": ["gate_s3", "temp"],
            "stage4_temp": ["gate_s4", "temp"],
            "up1_temp": ["gate_u1", "temp"],
            "up2_temp": ["gate_u2", "temp"],
            "up3_temp": ["gate_u3", "temp"],
            "up4_temp": ["gate_u4", "temp"],
            "latemp_stage1": ["gate_s1", "latemp"],
            "latemp_stage2": ["gate_s2", "latemp"],
            "latemp_stage3": ["gate_s3", "latemp"],
            "latemp_stage4": ["gate_s4", "latemp"],
            "latemp_up1": ["gate_u1", "latemp"],
            "latemp_up2": ["gate_u2", "latemp"],
            "latemp_up3": ["gate_u3", "latemp"],
            "latemp_up4": ["gate_u4", "latemp"],
        }
        for name, frags in gate_map.items():
            if f".{name}." in k:
                idx = int(k.split(f".{name}.")[1].split(".")[0])
                dense = "Dense_0" if idx == 0 else "Dense_1"
                return self._lookup(["denoiser"] + frags + [dense], leaf)
        if ".last." in k:
            idx = int(k.split(".last.")[1].split(".")[0])
            dense = "Dense_0" if idx == 0 else "Dense_1"
            root = [] if (k.startswith("model_refine") or self.refine) \
                else (["denoiser"] if k.startswith("model.") else [])
            return self._lookup(root + ["head", dense], leaf)
        raise KeyError(k)
