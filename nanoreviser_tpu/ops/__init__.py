from .reviser_kernel import stack_logits_pallas, stack_logits_reference

__all__ = ["stack_logits_pallas", "stack_logits_reference"]
