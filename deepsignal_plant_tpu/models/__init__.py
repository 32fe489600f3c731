from .bilstm import ModelBiLSTM, init_params, forward  # noqa: F401
