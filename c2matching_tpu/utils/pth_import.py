"""Import PyTorch checkpoints (.pth) into flax parameter trees.

Covers the reference's artifact kinds (base_model.py:185-265 save format —
state dicts with 'module.' prefixes stripped) and torchvision VGG weights:

- torchvision VGG features       -> VGGFeatureExtractor params
- ContrasExtractorSep state dict -> our ContrasExtractorSep params
- RestorationNet state dict      -> our RestorationNet params (incl. the
  DCN main weights (Cout, Cin, kh, kw) -> (K, Cin, Cout))
- ImageDiscriminator state dict  -> params + batch_stats

Layout conversions: torch conv OIHW -> flax HWIO; 16 sequential residual
blocks -> nn.scan-stacked (16, ...) leaves.
"""
import numpy as np

from ..models.archs.vgg_arch import NAMES


def _load_state_dict(path):
    import torch
    state = torch.load(path, map_location='cpu', weights_only=True)
    if isinstance(state, dict) and 'state_dict' in state:
        state = state['state_dict']
    out = {}
    for k, v in state.items():
        if k.startswith('module.'):
            k = k[7:]
        out[k] = np.asarray(v.detach().cpu().numpy())
    return out


def _conv_kernel(w_oihw):
    return np.transpose(w_oihw, (2, 3, 1, 0))


def _dcn_weight(w_oihw):
    cout, cin, kh, kw = w_oihw.shape
    return np.transpose(w_oihw, (2, 3, 1, 0)).reshape(kh * kw, cin, cout)


def torchvision_vgg_to_flax(state, vgg_type, layer_names):
    """Map torchvision ``features.{i}.*`` keys onto named conv params.

    torchvision's Sequential index i equals the position in the NAMES
    table (conv/relu/pool each occupy one slot), which is how the
    reference zips names onto layers (vgg_arch.py:106-117)."""
    names = NAMES[vgg_type]
    params = {}
    for idx, name in enumerate(names):
        if not name.startswith('conv'):
            continue
        wkey = f'features.{idx}.weight'
        if wkey not in state:
            continue
        if layer_names is not None and name not in layer_names:
            continue
        params[name] = {
            'kernel': _conv_kernel(state[wkey]),
            'bias': state[f'features.{idx}.bias'],
        }
    return params


def import_torchvision_vgg(path, vgg_type='vgg19'):
    """VGGFeatureExtractor params from a torchvision VGG .pth."""
    state = _load_state_dict(path)
    return {'params': torchvision_vgg_to_flax(state, vgg_type, None)}


def _contras_layer(state, prefix):
    """ContrasExtractorLayer params from ``{prefix}.model.{name}.*`` keys
    (contras_extractor_arch.py:24-28 names layers in an OrderedDict)."""
    params = {}
    for name in NAMES['vgg16']:
        wkey = f'{prefix}.model.{name}.weight'
        if wkey in state:
            params[name] = {
                'kernel': _conv_kernel(state[wkey]),
                'bias': state[f'{prefix}.model.{name}.bias'],
            }
    return params


def import_contras_extractor(path):
    """ContrasExtractorSep params from a reference net_extractor/.pth."""
    state = _load_state_dict(path)
    return {'params': {
        'feature_extraction_image1': _contras_layer(
            state, 'feature_extraction_image1'),
        'feature_extraction_image2': _contras_layer(
            state, 'feature_extraction_image2'),
    }}


def _stack_res_blocks(state, prefix, n_blocks):
    """torch ``{prefix}.{i}.conv{j}.*`` -> scan-stacked (n, ...) leaves in
    our ResBlockStack layout (blocks/block/conv{j})."""
    def stack(fmt, conv):
        return np.stack([fmt(i, conv) for i in range(n_blocks)])

    return {'blocks': {'block': {
        conv: {
            'kernel': stack(
                lambda i, c=None: _conv_kernel(
                    state[f'{prefix}.{i}.{conv}.weight']), conv),
            'bias': stack(
                lambda i, c=None: state[f'{prefix}.{i}.{conv}.bias'], conv),
        } for conv in ('conv1', 'conv2')
    }}}


def import_corres_generation(path, vgg_type='vgg19'):
    """CorrespondenceGenerationArch params from a reference net_map-style
    state dict. The reference CG module's only parameters are its frozen
    VGG (corres_generation_arch.py:26-27, keys ``vgg.vgg_net.{name}.*``);
    the matching part is parameter-free on both sides."""
    state = _load_state_dict(path)
    params = {}
    for name in NAMES[vgg_type]:
        wkey = f'vgg.vgg_net.{name}.weight'
        if wkey in state:
            params[name] = {
                'kernel': _conv_kernel(state[wkey]),
                'bias': state[f'vgg.vgg_net.{name}.bias'],
            }
    return {'params': {'vgg': params}}


def import_restoration_net(path, n_blocks=16):
    """RestorationNet params from a reference net_g .pth
    (ref_restoration_arch.py module names)."""
    state = _load_state_dict(path)

    def conv(key):
        return {'kernel': _conv_kernel(state[f'{key}.weight']),
                'bias': state[f'{key}.bias']}

    dyn = {}
    for scale in ('small', 'medium', 'large'):
        dyn[f'{scale}_offset_conv1'] = conv(
            f'dyn_agg_restore.{scale}_offset_conv1')
        dyn[f'{scale}_offset_conv2'] = conv(
            f'dyn_agg_restore.{scale}_offset_conv2')
        agg = f'dyn_agg_restore.{scale}_dyn_agg'
        dyn[f'{scale}_dyn_agg'] = {
            'weight': _dcn_weight(state[f'{agg}.weight']),
            'bias': state[f'{agg}.bias'],
            'conv_offset_mask': conv(f'{agg}.conv_offset_mask'),
        }
        # torch Sequential heads/tails: index 0 is the conv
        dyn[f'head_{scale}'] = conv(f'dyn_agg_restore.head_{scale}.0')
        dyn[f'body_{scale}'] = _stack_res_blocks(
            state, f'dyn_agg_restore.body_{scale}', n_blocks)
        if scale != 'large':
            dyn[f'tail_{scale}'] = conv(f'dyn_agg_restore.tail_{scale}.0')
    dyn['tail_large_conv1'] = conv('dyn_agg_restore.tail_large.0')
    dyn['tail_large_conv2'] = conv('dyn_agg_restore.tail_large.2')

    params = {
        'content_extractor': {
            'conv_first': conv('content_extractor.conv_first'),
            'body': _stack_res_blocks(state, 'content_extractor.body',
                                      n_blocks),
        },
        'dyn_agg_restore': dyn,
    }
    return {'params': params}


def import_discriminator(path):
    """ImageDiscriminator params + batch_stats from a reference net_d
    .pth (discriminator_arch.py conv_blockN Sequential layout:
    0 conv, 1 bn, 3 conv, 4 bn)."""
    state = _load_state_dict(path)
    params, batch_stats = {}, {}
    for i in range(1, 6):
        for j, (conv_idx, bn_idx) in enumerate(((0, 1), (3, 4)), start=1):
            base = f'conv_block{i}.{conv_idx}'
            params[f'block{i}_conv{j}'] = {
                'kernel': _conv_kernel(state[f'{base}.weight']),
                'bias': state[f'{base}.bias'],
            }
            bn = f'conv_block{i}.{bn_idx}'
            params[f'block{i}_bn{j}'] = {
                'scale': state[f'{bn}.weight'],
                'bias': state[f'{bn}.bias'],
            }
            batch_stats[f'block{i}_bn{j}'] = {
                'mean': state[f'{bn}.running_mean'],
                'var': state[f'{bn}.running_var'],
            }
    params['out_conv1'] = {
        'kernel': _conv_kernel(state['out_block.1.weight']),
        'bias': state['out_block.1.bias']}
    params['out_conv2'] = {
        'kernel': _conv_kernel(state['out_block.3.weight']),
        'bias': state['out_block.3.bias']}
    return {'params': params, 'batch_stats': batch_stats}
