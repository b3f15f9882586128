from .resnet import XiangqiNet, count_parameters, init_net  # noqa: F401
