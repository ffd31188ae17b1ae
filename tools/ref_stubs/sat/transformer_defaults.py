"""SAT's standard hook defaults (public SwissArmyTransformer semantics),
matching the attribute layout of the reference's patched transformer.py
(SelfAttention.query_key_value/dense, MLP.dense_h_to_4h/dense_4h_to_h)."""

import math

import torch
import torch.nn.functional as F


def split_tensor_along_last_dim(tensor, num_partitions,
                                contiguous_split_chunks=False):
    last_dim = tensor.dim() - 1
    last_dim_size = tensor.size()[last_dim] // num_partitions
    tensor_list = torch.split(tensor, last_dim_size, dim=last_dim)
    if contiguous_split_chunks:
        return tuple(chunk.contiguous() for chunk in tensor_list)
    return tensor_list


def standard_attention(query_layer, key_layer, value_layer, attention_mask,
                       attention_dropout=None, log_attention_weights=None,
                       scaling_attention_score=True, **kwargs):
    if scaling_attention_score:
        query_layer = query_layer / math.sqrt(query_layer.shape[-1])
    attention_scores = torch.matmul(query_layer, key_layer.transpose(-1, -2))
    if log_attention_weights is not None:
        attention_scores += log_attention_weights
    if not (attention_mask.shape[-2] == 1 and (attention_mask > 0).all()):
        attention_scores = (torch.mul(attention_scores, attention_mask)
                            - 10000.0 * (1.0 - attention_mask))
    attention_probs = F.softmax(attention_scores, dim=-1)
    if attention_dropout is not None:
        attention_probs = attention_dropout(attention_probs)
    context_layer = torch.matmul(attention_probs, value_layer)
    return context_layer


def attention_fn_default(query_layer, key_layer, value_layer, attention_mask,
                         attention_dropout=None, log_attention_weights=None,
                         scaling_attention_score=True, **kwargs):
    return standard_attention(
        query_layer, key_layer, value_layer, attention_mask,
        attention_dropout=attention_dropout,
        log_attention_weights=log_attention_weights,
        scaling_attention_score=scaling_attention_score, **kwargs)


def attention_forward_default(self, hidden_states, mask, **kw_args):
    self = self.transformer.layers[kw_args['layer_id']].attention
    attention_fn = attention_fn_default
    if 'attention_fn' in self.hooks:
        attention_fn = self.hooks['attention_fn']

    mixed_raw_layer = self.query_key_value(hidden_states)
    (mixed_query_layer, mixed_key_layer,
     mixed_value_layer) = split_tensor_along_last_dim(mixed_raw_layer, 3)

    dropout_fn = self.attention_dropout if self.training else None

    query_layer = self._transpose_for_scores(mixed_query_layer)
    key_layer = self._transpose_for_scores(mixed_key_layer)
    value_layer = self._transpose_for_scores(mixed_value_layer)

    context_layer = attention_fn(query_layer, key_layer, value_layer, mask,
                                 dropout_fn, **kw_args)

    context_layer = context_layer.permute(0, 2, 1, 3).contiguous()
    new_context_layer_shape = (context_layer.size()[:-2]
                               + (self.hidden_size_per_partition,))
    context_layer = context_layer.view(*new_context_layer_shape)
    output = self.dense(context_layer)

    if self.training:
        output = self.output_dropout(output)
    return output


def cross_attention_forward_default(self, hidden_states,
                                    cross_attention_mask, encoder_outputs,
                                    **kw_args):
    raise NotImplementedError('cross attention unused by the DiT dumps')


def mlp_forward_default(self, hidden_states, **kw_args):
    self = self.transformer.layers[kw_args['layer_id']].mlp
    intermediate_parallel = self.dense_h_to_4h(hidden_states)
    intermediate_parallel = self.activation_func(intermediate_parallel)
    output = self.dense_4h_to_h(intermediate_parallel)
    return output


def word_embedding_forward_default(self, input_ids, output_cross_layer,
                                   **kw_args):
    return self.transformer.word_embeddings(input_ids)


def position_embedding_forward_default(self, position_ids, output_cross_layer,
                                       **kw_args):
    return self.transformer.position_embeddings(position_ids)


def final_forward_default(self, logits, **kw_args):
    return F.linear(logits, self.transformer.word_embeddings.weight)


def layer_forward_default(self, hidden_states, mask, *args, **kw_args):
    """Standard pre-LN layer (layernorm_order='pre'); the DiT overrides this
    with AdaLNMixin.layer_forward, kept for completeness."""
    layer = self.transformer.layers[kw_args['layer_id']]
    attention_input = layer.input_layernorm(hidden_states)
    attention_output = layer.attention(attention_input, mask, **kw_args)
    hidden_states = hidden_states + attention_output
    mlp_input = layer.post_attention_layernorm(hidden_states)
    mlp_output = layer.mlp(mlp_input, **kw_args)
    return hidden_states + mlp_output


HOOKS_DEFAULT = {
    'attention_fn': attention_fn_default,
    'attention_forward': attention_forward_default,
    'cross_attention_forward': cross_attention_forward_default,
    'mlp_forward': mlp_forward_default,
    'word_embedding_forward': word_embedding_forward_default,
    'position_embedding_forward': position_embedding_forward_default,
    'final_forward': final_forward_default,
    'layer_forward': layer_forward_default,
}
