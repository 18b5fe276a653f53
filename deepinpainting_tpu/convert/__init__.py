from .vgg_import import convert_vgg16_state_dict, torch_file_to_npz
