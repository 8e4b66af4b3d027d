from .torch_import import (convert_cdgs_state_dict, convert_dgt_state_dict,
                           load_reference_checkpoint)

__all__ = ["convert_dgt_state_dict", "convert_cdgs_state_dict",
           "load_reference_checkpoint"]
