from .attention import flash_attention, sdpa, sdpa_reference
from .ring_attention import attention_with_lse, ring_attention
