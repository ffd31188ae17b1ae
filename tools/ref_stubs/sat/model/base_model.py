"""SAT BaseModel: mixin registry + hook resolution over the reference's own
patched BaseTransformer (cogvideox-based/transformer.py — loaded by file path
so the LIEM-patched layer code under test is the reference's, not ours).

Hook semantics (public SAT): a mixin method named like a HOOKS_DEFAULT key
becomes that hook; a second definition must carry @non_conflict and receives
the previous hook as old_impl (whose default value, attention_fn_default,
applies when it is the first). BaseModel.forward refreshes the shared
transformer.hooks dict, exactly as SAT does ("hooks will be updated each
forward", transformer.py:561).
"""

import importlib.util
import os
from functools import partial

import torch
import torch.nn as nn

from ..transformer_defaults import HOOKS_DEFAULT

_REF_TRANSFORMER = os.environ.get(
    'STAR_REF_TRANSFORMER',
    '/root/reference/cogvideox-based/transformer.py')


def _load_ref_transformer():
    spec = importlib.util.spec_from_file_location('sat_ref_transformer',
                                                  _REF_TRANSFORMER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def non_conflict(func):
    func.non_conflict = True
    return func


class BaseModel(nn.Module):
    def __init__(self, args, transformer=None, params_dtype=torch.float,
                 **kwargs):
        super().__init__()
        self.mixins = nn.ModuleDict()
        self.collect_hooks_()
        if transformer is not None:
            self.transformer = transformer
        else:
            ref = _load_ref_transformer()
            self.transformer = ref.BaseTransformer(
                num_layers=args.num_layers,
                vocab_size=getattr(args, 'vocab_size', 1),
                hidden_size=args.hidden_size,
                num_attention_heads=args.num_attention_heads,
                max_sequence_length=getattr(args, 'max_sequence_length', 64),
                embedding_dropout_prob=getattr(args, 'hidden_dropout', 0.0),
                attention_dropout_prob=getattr(args, 'attention_dropout', 0.0),
                output_dropout_prob=getattr(args, 'hidden_dropout', 0.0),
                inner_hidden_size=getattr(args, 'inner_hidden_size', None),
                hidden_size_per_attention_head=getattr(
                    args, 'hidden_size_per_attention_head', None),
                checkpoint_activations=getattr(
                    args, 'checkpoint_activations', False),
                checkpoint_num_layers=getattr(
                    args, 'checkpoint_num_layers', 1),
                layernorm_order=getattr(args, 'layernorm_order', 'pre'),
                is_decoder=getattr(args, 'is_decoder', False),
                use_bias=getattr(args, 'use_bias', True),
                use_qkv_bias=getattr(args, 'use_qkv_bias', False),
                parallel_output=kwargs.pop(
                    'parallel_output', getattr(args, 'parallel_output', True)),
                params_dtype=params_dtype,
                skip_init=getattr(args, 'skip_init', False),
                device=torch.device('cpu'),
                hooks=self.hooks,
                **kwargs,
            )

    def add_mixin(self, name, new_mixin, reinit=False):
        assert name not in self.mixins
        assert isinstance(new_mixin, nn.Module)
        self.mixins[name] = new_mixin
        object.__setattr__(new_mixin, 'transformer', self.transformer)
        self.collect_hooks_()
        if reinit:
            new_mixin.reinit(self)

    def collect_hooks_(self):
        names = list(HOOKS_DEFAULT.keys())
        hooks = {}
        origins = {}
        for name in names:
            for mixin_name, m in getattr(self, 'mixins', {}).items():
                if hasattr(m, name):
                    fn = getattr(m, name)
                    if name in hooks:  # conflict
                        if hasattr(fn, 'non_conflict') or hasattr(
                                getattr(type(m), name, None), 'non_conflict'):
                            hooks[name] = partial(fn, old_impl=hooks[name])
                            origins[name] = f'{mixin_name} -> {origins[name]}'
                        else:
                            raise ValueError(
                                f'hook {name} conflicts: {mixin_name} vs '
                                f'{origins[name]}')
                    else:
                        hooks[name] = fn
                        origins[name] = mixin_name
            if hasattr(self, name):  # the model class itself may define hooks
                fn = getattr(self, name)
                if name in hooks:
                    if hasattr(fn, 'non_conflict') or hasattr(
                            getattr(type(self), name, None), 'non_conflict'):
                        hooks[name] = partial(fn, old_impl=hooks[name])
                        origins[name] = f'model -> {origins[name]}'
                    else:
                        raise ValueError(f'hook {name} conflicts with model')
                else:
                    hooks[name] = fn
                    origins[name] = 'model'
        if not hasattr(self, 'hooks'):
            self.hooks = hooks
        else:
            self.hooks.clear()
            self.hooks.update(hooks)
        self.hook_origins = origins
        return hooks

    def forward(self, *args, **kwargs):
        self.transformer.hooks.clear()
        self.transformer.hooks.update(self.hooks)
        return self.transformer(*args, **kwargs)

    def reinit(self, mixin_names=None):
        for name, m in self.mixins.items():
            if mixin_names is None or name in mixin_names:
                m.reinit(self)

    def disable_untrainable_params(self):
        pass
