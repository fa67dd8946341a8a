from showo_tpu.sampling.schedules import (
    cosine_schedule,
    get_mask_schedule,
    linear_schedule,
    pow_schedule,
    sigmoid_schedule,
)
from showo_tpu.sampling.maskgit import mask_by_random_topk, maskgit_generate
from showo_tpu.sampling.ar import ar_generate
