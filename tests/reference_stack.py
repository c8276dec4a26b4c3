"""Run the reference's own torch modules on CPU for composite parity tests.

The upstream C2-Matching inference stack (ref_restoration_model.py:271-278)
is three torch modules: ContrasExtractorSep -> CorrespondenceGenerationArch
-> RestorationNet. All of it is plain CPU-runnable torch except the DCNv2
CUDA extension (``import _ext``, DCNv2/dcn_v2.py:6), whose CPU source
raises NotImplementedError upstream (DCNv2/src/cpu/dcn_v2_cpu.cpp).

This module loads the reference's arch files VERBATIM from
/root/reference (no code copied into this repo) by pre-registering:

- package shells for ``mmsr``/``mmsr.models``/``mmsr.models.archs``/
  ``mmsr.models.archs.DCNv2`` whose __path__ points at the reference tree
  (so the real arch modules import without executing the reference's
  mmcv-dependent package __init__ files);
- a ``torchvision.models.vgg`` stub exposing randomly-initialized
  ``vgg16``/``vgg19`` builders with a ``.features`` Sequential (no
  torchvision / no weight download in this environment — both stacks load
  IDENTICAL weights from a saved state dict, so only the module structure
  matters);
- an ``_ext`` stub implementing ``dcn_v2_forward`` as a vectorized numpy
  transcription of the CUDA kernel semantics
  (dcn_v2_im2col_cuda.cu:125-195). The transcription is itself pinned to
  the per-pixel loop oracle in tests/test_deform_conv.py (see
  tests/test_composite_parity.py::test_ext_stub_matches_loop_oracle).
"""
import importlib
import sys
import types

import numpy as np

REFERENCE_ROOT = '/root/reference'

_VGG_CFGS = {
    'vgg16': [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
              512, 512, 512, 'M', 512, 512, 512, 'M'],
    'vgg19': [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
              512, 512, 512, 512, 'M', 512, 512, 512, 512, 'M'],
}


def np_dcn_v2_forward(x, weight, bias, offset, mask,
                      kh, kw, sh, sw, ph, pw, dh, dw, dg):
    """Vectorized numpy DCNv2 forward with CUDA-kernel semantics.

    Layouts follow the CUDA extension (dcn_v2_cuda.cu / im2col):
      x:(N,C,H,W)  weight:(Co,C,kh,kw)  bias:(Co,)
      offset:(N, dg*2*K, Ho, Wo) interleaved [y, x] per tap per group
      mask:(N, dg*K, Ho, Wo)
    Bilinear sampling is zero-padded with the out-of-range guard
    ``y > -1 and x > -1 and y < H and x < W`` (dcn_v2_im2col_cuda.cu:166).
    """
    n, c, h, w = x.shape
    k = kh * kw
    ho = (h + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    wo = (w + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1
    cg = c // dg
    co = weight.shape[0]
    wk = weight.reshape(co, c, k)                       # (Co, C, K)
    base_y = (np.arange(ho) * sh - ph)[:, None].astype(np.float32)
    base_x = (np.arange(wo) * sw - pw)[None, :].astype(np.float32)
    xpad = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    out = np.zeros((n, co, ho, wo), np.float32)
    for ni in range(n):
        for g in range(dg):
            sl = xpad[ni, g * cg:(g + 1) * cg]          # (cg, H+2, W+2)
            for tap in range(k):
                ki, kj = tap // kw, tap % kw
                sy = base_y + ki * dh + offset[ni, g * 2 * k + 2 * tap]
                sx = base_x + kj * dw + offset[ni, g * 2 * k + 2 * tap + 1]
                m = mask[ni, g * k + tap]
                valid = (sy > -1) & (sy < h) & (sx > -1) & (sx < w)
                y0 = np.floor(sy)
                x0 = np.floor(sx)
                fy = (sy - y0).astype(np.float32)
                fx = (sx - x0).astype(np.float32)
                iy = np.clip(y0.astype(np.int64) + 1, 0, h + 1)
                ix = np.clip(x0.astype(np.int64) + 1, 0, w + 1)
                iy1 = np.clip(iy + 1, 0, h + 1)
                ix1 = np.clip(ix + 1, 0, w + 1)
                val = ((1 - fy) * (1 - fx) * sl[:, iy, ix]
                       + (1 - fy) * fx * sl[:, iy, ix1]
                       + fy * (1 - fx) * sl[:, iy1, ix]
                       + fy * fx * sl[:, iy1, ix1])
                val = val * (m * valid)
                out[ni] += np.einsum('cij,oc->oij', val,
                                     wk[:, g * cg:(g + 1) * cg, tap])
    return out + bias.reshape(1, co, 1, 1)


def _make_ext_stub():
    import torch

    mod = types.ModuleType('_ext')

    def dcn_v2_forward(x, weight, bias, offset, mask,
                       kh, kw, sh, sw, ph, pw, dh, dw, dg):
        out = np_dcn_v2_forward(
            x.detach().numpy().astype(np.float32),
            weight.detach().numpy().astype(np.float32),
            bias.detach().numpy().astype(np.float32),
            offset.detach().numpy().astype(np.float32),
            mask.detach().numpy().astype(np.float32),
            kh, kw, sh, sw, ph, pw, dh, dw, dg)
        return torch.from_numpy(out)

    mod.dcn_v2_forward = dcn_v2_forward
    return mod


def _make_torchvision_stub():
    import torch.nn as tnn

    tv = types.ModuleType('torchvision')
    models = types.ModuleType('torchvision.models')
    vgg = types.ModuleType('torchvision.models.vgg')

    def _builder(cfg):
        def build(pretrained=False, **kwargs):
            layers, in_c = [], 3
            for v in cfg:
                if v == 'M':
                    layers.append(tnn.MaxPool2d(2, 2))
                else:
                    layers += [tnn.Conv2d(in_c, v, 3, padding=1),
                               tnn.ReLU(inplace=True)]
                    in_c = v
            holder = tnn.Module()
            holder.features = tnn.Sequential(*layers)
            return holder
        return build

    for name, cfg in _VGG_CFGS.items():
        setattr(vgg, name, _builder(cfg))
    models.vgg = vgg
    tv.models = models
    return {'torchvision': tv, 'torchvision.models': models,
            'torchvision.models.vgg': vgg}


def _pkg_shell(name, path):
    mod = types.ModuleType(name)
    mod.__path__ = [path]
    mod.__package__ = name
    return mod


def load_reference_archs():
    """Import the reference arch modules verbatim; returns a dict of
    modules and the saved/overridden sys.modules entries for restoration.

    Returns (archs, saved) where archs has keys 'contras', 'corres',
    'restoration', 'arch_util', 'ref_map_util', 'dcn_v2' and saved maps
    module names to their previous sys.modules entries (or None).
    """
    base = f'{REFERENCE_ROOT}/mmsr/models/archs'
    stubs = dict(_make_torchvision_stub())
    stubs['_ext'] = _make_ext_stub()
    stubs['mmsr'] = _pkg_shell('mmsr', f'{REFERENCE_ROOT}/mmsr')
    stubs['mmsr.models'] = _pkg_shell('mmsr.models',
                                      f'{REFERENCE_ROOT}/mmsr/models')
    stubs['mmsr.models.archs'] = _pkg_shell('mmsr.models.archs', base)
    stubs['mmsr.models.archs.DCNv2'] = _pkg_shell(
        'mmsr.models.archs.DCNv2', f'{base}/DCNv2')

    ref_mods = ['mmsr.models.archs.arch_util',
                'mmsr.models.archs.ref_map_util',
                'mmsr.models.archs.vgg_arch',
                'mmsr.models.archs.contras_extractor_arch',
                'mmsr.models.archs.corres_generation_arch',
                'mmsr.models.archs.discriminator_arch',
                'mmsr.models.archs.DCNv2.dcn_v2',
                'mmsr.models.archs.ref_restoration_arch']
    saved = {}
    for name in list(stubs) + ref_mods:
        saved[name] = sys.modules.get(name)
    sys.modules.update(stubs)
    try:
        loaded = {name: importlib.import_module(name) for name in ref_mods}
    except Exception:
        restore_modules(saved)
        raise
    archs = {
        'arch_util': loaded['mmsr.models.archs.arch_util'],
        'ref_map_util': loaded['mmsr.models.archs.ref_map_util'],
        'vgg_arch': loaded['mmsr.models.archs.vgg_arch'],
        'contras': loaded['mmsr.models.archs.contras_extractor_arch'],
        'corres': loaded['mmsr.models.archs.corres_generation_arch'],
        'discriminator': loaded['mmsr.models.archs.discriminator_arch'],
        'dcn_v2': loaded['mmsr.models.archs.DCNv2.dcn_v2'],
        'restoration': loaded['mmsr.models.archs.ref_restoration_arch'],
    }
    return archs, saved


def restore_modules(saved):
    for name, prev in saved.items():
        if prev is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = prev
