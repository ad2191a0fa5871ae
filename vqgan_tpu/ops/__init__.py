from .attention import flash_attention, sdpa, sdpa_reference
