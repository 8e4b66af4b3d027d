from .torch_import import convert_dgt_state_dict, load_reference_checkpoint

__all__ = ["convert_dgt_state_dict", "load_reference_checkpoint"]
