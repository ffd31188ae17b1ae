from .schedules import (Schedule, noise_schedule, default_star_schedule,
                        karras_schedule, build_sigma_ladder,
                        trailing_timesteps, t_to_sigma, sigma_to_t)
from .gaussian import (DiffusionTables, diffuse, get_velocity, get_x0,
                       denoise_to_x0, guide_rescale_combine)
from .solvers import sample_dpmpp_2m_sde, sample_heun, SOLVERS
