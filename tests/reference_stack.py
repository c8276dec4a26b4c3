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


def torch_dcn_v2_forward(x, weight, bias, offset, mask,
                         kh, kw, sh, sw, ph, pw, dh, dw, dg):
    """Differentiable pure-torch DCNv2 forward with CUDA-kernel
    semantics — the same math as ``np_dcn_v2_forward`` expressed in
    autograd-traceable torch ops.

    Purpose: torch.autograd of THIS function reproduces the analytic
    gradients of the CUDA backward (dcn_v2_cuda.cu:206-335):
    - d/d-offset: the bilinear sample is written as an explicit 4-tap
      interpolation with detached floor coordinates, so autograd yields
      exactly the analytic d(bilinear)/d(coordinate) weights of
      ``dmcn_get_coordinate_weight`` (dcn_v2_im2col_cuda.cu:82-123);
    - d/d-input: advanced-indexing backward is scatter-add, the
      functional mirror of the atomicAdd col2im kernel
      (dcn_v2_im2col_cuda.cu:197-254);
    - d/d-weight, d/d-bias: linear contraction transposes
      (im2col+GEMM / Sgemv, dcn_v2_cuda.cu:302-329).
    The out-of-range guard multiplies by a detached indicator, matching
    the CUDA coordinate-gradient's zero outside (-1, H)x(-1, W).
    """
    import torch

    n, c, h, w = x.shape
    k = kh * kw
    ho = (h + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    wo = (w + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1
    cg = c // dg
    co = weight.shape[0]
    wk = weight.reshape(co, c, k)
    base_y = (torch.arange(ho, dtype=x.dtype) * sh - ph).view(-1, 1)
    base_x = (torch.arange(wo, dtype=x.dtype) * sw - pw).view(1, -1)
    xpad = torch.nn.functional.pad(x, (1, 1, 1, 1))
    out = x.new_zeros(n, co, ho, wo)
    for ni in range(n):
        for g in range(dg):
            sl = xpad[ni, g * cg:(g + 1) * cg]          # (cg, H+2, W+2)
            vals = []
            for tap in range(k):
                ki, kj = tap // kw, tap % kw
                sy = base_y + ki * dh + offset[ni, g * 2 * k + 2 * tap]
                sx = base_x + kj * dw + offset[ni, g * 2 * k + 2 * tap + 1]
                m = mask[ni, g * k + tap]
                valid = ((sy > -1) & (sy < h) & (sx > -1)
                         & (sx < w)).to(x.dtype).detach()
                y0 = torch.floor(sy).detach()
                x0 = torch.floor(sx).detach()
                fy = sy - y0
                fx = sx - x0
                iy = (y0.long() + 1).clamp(0, h + 1)
                ix = (x0.long() + 1).clamp(0, w + 1)
                iy1 = (iy + 1).clamp(0, h + 1)
                ix1 = (ix + 1).clamp(0, w + 1)
                val = ((1 - fy) * (1 - fx) * sl[:, iy, ix]
                       + (1 - fy) * fx * sl[:, iy, ix1]
                       + fy * (1 - fx) * sl[:, iy1, ix]
                       + fy * fx * sl[:, iy1, ix1])
                vals.append(val * (m * valid))
            col = torch.stack(vals, dim=1)               # (cg, K, Ho, Wo)
            out[ni] = out[ni] + torch.einsum(
                'ckij,ock->oij', col, wk[:, g * cg:(g + 1) * cg])
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

    def dcn_v2_backward(x, weight, bias, offset, mask, grad_output,
                        kh, kw, sh, sw, ph, pw, dh, dw, dg):
        """CPU stand-in for the CUDA backward (dcn_v2_cuda.cu:206-335),
        called by the reference's ``_DCNv2.backward``
        (DCNv2/dcn_v2.py:34-50): autograd through the differentiable
        transcription above (whose gradients ARE the analytic CUDA
        formulas; pinned by gradcheck in
        tests/test_composite_train_parity.py)."""
        # _DCNv2.backward runs under @once_differentiable (grad mode
        # OFF); the internal autograd recompute must re-enable it
        with torch.enable_grad():
            leaves = [t.detach().double().requires_grad_(True)
                      for t in (x, offset, mask, weight, bias)]
            xx, off, msk, w, b = leaves
            out = torch_dcn_v2_forward(xx, w, b, off, msk, kh, kw, sh, sw,
                                       ph, pw, dh, dw, dg)
            out.backward(grad_output.double())
        return tuple(t.grad.to(x.dtype) for t in leaves)

    mod.dcn_v2_forward = dcn_v2_forward
    mod.dcn_v2_backward = dcn_v2_backward
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


def _make_mmcv_stub():
    """Minimal mmcv stand-in (the real package is not installed here):
    only the names the reference MODEL layer touches at import time or
    inside optimize_parameters — ``mmcv.runner.master_only`` (decorator,
    rank gating is irrelevant single-process), ``mmcv.imwrite`` and
    ``mmcv.scandir`` (validation/registry helpers we don't exercise)."""
    mmcv = types.ModuleType('mmcv')
    runner = types.ModuleType('mmcv.runner')

    def master_only(fn):
        return fn

    runner.master_only = master_only
    mmcv.runner = runner
    mmcv.imwrite = lambda img, path, **kw: None

    def scandir(path, suffix=None):
        import os
        for f in sorted(os.listdir(path)):
            if suffix is None or f.endswith(suffix):
                yield f

    mmcv.scandir = scandir
    return {'mmcv': mmcv, 'mmcv.runner': runner}


class _ProgressBarStub:
    def __init__(self, *a, **k):
        pass

    def update(self, *a, **k):
        pass


def load_reference_models():
    """Import the reference's MODEL layer verbatim (losses, schedulers,
    networks factory, BaseModel/SRModel and the three stage models) on
    top of the arch modules from :func:`load_reference_archs`, so the
    reference's own ``optimize_parameters`` (ref_restoration_model.py:
    192-269, teacher_contras_model.py:212-227,
    student_contras_distillation_model.py:259-275) can run optimizer
    steps on CPU for training-parity tests.

    Returns (models, archs, saved): ``models`` maps short names to the
    verbatim modules; pass ``saved`` to :func:`restore_modules`.
    """
    archs, saved = load_reference_archs()

    mmcv_stubs = _make_mmcv_stub()
    # mmsr.utils: stub the symbols the model layer imports at module
    # scope (ProgressBar/tensor2img are validation-only); __path__ points
    # at the real tree so ``import mmsr.utils.metrics`` (cv2+numpy only)
    # loads the reference's own metrics module.
    utils_mod = _pkg_shell('mmsr.utils', f'{REFERENCE_ROOT}/mmsr/utils')
    utils_mod.ProgressBar = _ProgressBarStub
    utils_mod.tensor2img = lambda *a, **k: None
    utils_mod.crop_border = lambda *a, **k: None
    stubs = dict(mmcv_stubs)
    stubs['mmsr.utils'] = utils_mod

    # the reference's registry: archs/__init__.py scans *_arch.py with
    # mmcv.scandir; the arch modules are already imported verbatim by
    # load_reference_archs, so expose them as ``_arch_modules`` on the
    # package shell for networks.py:1.
    sys.modules['mmsr.models.archs']._arch_modules = [
        archs['contras'], archs['corres'], archs['discriminator'],
        archs['vgg_arch'], archs['restoration'],
    ]

    ref_mods = ['mmsr.utils.metrics',
                'mmsr.models.loss_utils',
                'mmsr.models.losses',
                'mmsr.models.lr_scheduler',
                'mmsr.models.networks',
                'mmsr.models.base_model',
                'mmsr.models.sr_model',
                'mmsr.models.ref_restoration_model',
                'mmsr.models.teacher_contras_model',
                'mmsr.models.student_contras_distillation_model']
    for name in list(stubs) + ref_mods:
        if name not in saved:
            saved[name] = sys.modules.get(name)
    sys.modules.update(stubs)
    try:
        loaded = {name: importlib.import_module(name) for name in ref_mods}
    except Exception:
        restore_modules(saved)
        raise
    models = {
        'metrics': loaded['mmsr.utils.metrics'],
        'losses': loaded['mmsr.models.losses'],
        'lr_scheduler': loaded['mmsr.models.lr_scheduler'],
        'networks': loaded['mmsr.models.networks'],
        'base_model': loaded['mmsr.models.base_model'],
        'sr_model': loaded['mmsr.models.sr_model'],
        'ref_restoration': loaded['mmsr.models.ref_restoration_model'],
        'teacher': loaded['mmsr.models.teacher_contras_model'],
        'student': loaded['mmsr.models.student_contras_distillation_model'],
    }
    return models, archs, saved
