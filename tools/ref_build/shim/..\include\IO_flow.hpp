#include <IO_flow.hpp>
