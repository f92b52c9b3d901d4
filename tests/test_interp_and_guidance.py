"""torch_interp vs torch F.interpolate; guidance masks vs the reference's
loop-built masks (extracted by running the reference's guided stream)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from cognitive_aim_tpu.models import guidance as G  # noqa: E402
from cognitive_aim_tpu.nn.torch_interp import resize_2d, resize_weights  # noqa: E402


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("in_s,out_s", [(37, 16), (16, 37), (8, 8), (5, 13)])
def test_resize_matches_torch(mode, in_s, out_s):
    x = np.random.RandomState(0).randn(2, 3, in_s, in_s).astype(np.float32)
    want = F.interpolate(
        torch.tensor(x), size=(out_s, out_s), mode=mode, align_corners=False
    ).numpy()
    got = np.asarray(resize_2d(jnp.asarray(x), out_s, out_s, mode))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_mask_table_matches_reference_loops():
    """Rebuild the reference's spatial masks by calling its _guided_focal_stream
    mask logic through a minimal shim: we instantiate the loops' semantics via
    the reference source executed on a stub module object."""
    from conftest import import_reference_model

    ref = import_reference_model()

    class Shim:
        # borrow the unbound method; provide the attributes it reads
        feature_dim = 8

        def __init__(self):
            self.focal_stream = ref.FocalStream(8, curiosity_guided=False).eval()

    shim = Shim()
    torch.manual_seed(0)
    g = 16
    n = g * g
    patches = torch.randn(1, n, 8)
    for name in G.INSTRUCTIONS:
        with torch.no_grad():
            _, want_attn = ref.CognitiveAimModel._guided_focal_stream(
                shim, patches, None, name
            )
        # reproduce the blend with OUR mask and THEIR base attention
        with torch.no_grad():
            _, base = shim.focal_stream(patches, None)
        mask = np.asarray(G.mask_table(g, n))[G.instruction_index(name)]
        guided = 0.7 * mask[None] + 0.3 * base.numpy()
        guided = torch.softmax(torch.tensor(guided) / 0.05, dim=-1).numpy()
        np.testing.assert_allclose(guided, want_attn.numpy(), atol=1e-5,
                                   err_msg=name)


def test_instruction_aliases():
    assert G.instruction_index("TopLeft".lower()) == G.instruction_index("top-left")
    assert G.instruction_index("bottomright") == G.instruction_index("bottom-right")
    with pytest.raises(ValueError):
        G.instruction_index("northwest")


def test_mask_resize_path():
    """Non-square patch counts route through bilinear resize (ref:1384-1398)."""
    t = G.mask_table(16, 144)  # 16x16 masks resized to 12x12
    assert t.shape == (9, 144)
