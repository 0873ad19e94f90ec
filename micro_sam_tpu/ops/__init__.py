from .attention import attention_with_rel_pos, attention
