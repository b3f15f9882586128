from .resnet import (  # noqa: F401
    XiangqiNet,
    count_parameters,
    init_net,
    policy_logits_fn,
    policy_value_fn,
)
