from .binding import condition_exact, native_available
