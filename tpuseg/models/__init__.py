from tpuseg.models.unet3d import UNet3D, build_model, init_params, init_variables

__all__ = ["UNet3D", "build_model", "init_params", "init_variables"]
