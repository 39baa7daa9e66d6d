// Golden RRTC fixture generator: runs the reference RRT-Connect planner
// (planning/rrtc.hh, with a linear-scan exact NN standing in for the
// CPM-fetched nigh kd-tree — see stub/nigh/) on the Panda sphere-cage demo
// and dumps solved/iterations/path/cost for parity tests. Build & run:
//
//   g++ -O0 -march=native -std=c++17 \
//       -I /root/reference/src/impl -I tools/golden/stub \
//       tools/golden/golden_rrtc.cc -o /tmp/golden_rrtc
//   /tmp/golden_rrtc > tests/golden/reference_rrtc.json

#include <array>
#include <cstdio>
#include <memory>
#include <vector>

#include <vamp/vector.hh>
#include <vamp/collision/environment.hh>
#include <vamp/collision/validity.hh>
#include <vamp/planning/validate.hh>
#include <vamp/planning/rrtc.hh>
#include <vamp/planning/simplify.hh>
#include <vamp/random/halton.hh>
#include <vamp/robots/panda_base.hh>

using namespace vamp;

static constexpr std::size_t rake = 8;
using Robot = robots::PandaBase<0, 0, 0>;
using EnvF = collision::Environment<float>;
using EnvV = collision::Environment<FloatVector<rake>>;

static void print_floats(const float *v, std::size_t n)
{
    std::printf("[");
    for (std::size_t i = 0; i < n; ++i)
        std::printf("%s%.9g", i ? "," : "", static_cast<double>(v[i]));
    std::printf("]");
}

int main()
{
    EnvF env_f;
    const float centers[14][3] = {
        {0.55, 0, 0.25},    {0.35, 0.35, 0.25}, {0, 0.55, 0.25},   {-0.55, 0, 0.25},
        {-0.35, -0.35, 0.25}, {0, -0.55, 0.25}, {0.35, -0.35, 0.25}, {0.35, 0.35, 0.8},
        {0, 0.55, 0.8},     {-0.35, 0.35, 0.8}, {-0.55, 0, 0.8},   {-0.35, -0.35, 0.8},
        {0, -0.55, 0.8},    {0.35, -0.35, 0.8}};
    for (auto &c : centers)
        env_f.spheres.emplace_back(collision::Sphere<float>(c[0], c[1], c[2], 0.2F));
    env_f.sort();
    EnvV env(env_f);

    alignas(32) std::array<float, 8> a_arr{0.F, -0.785F, 0.F, -2.356F, 0.F, 1.571F, 0.785F, 0.F};
    alignas(32) std::array<float, 8> b_arr{2.35F, 1.F, 0.F, -0.8F, 0.F, 2.5F, 0.785F, 0.F};
    Robot::Configuration start(a_arr.data());
    Robot::Configuration goal(b_arr.data());

    planning::RRTCSettings settings;
    settings.range = 1.0;  // vamp python layer default for panda
                           // (src/vamp/constants.py ROBOT_RRT_RANGES)

    std::printf("{\n\"runs\": [");
    const int skips[] = {0, 1000, 5000};
    bool first = true;
    for (int skip : skips)
    {
        auto rng = std::make_shared<rng::Halton<7>>();
        for (int i = 0; i < skip; ++i)
            rng->next();

        auto result =
            planning::RRTC<Robot, rake, Robot::resolution>::solve(start, goal, env, settings, rng);

        std::printf("%s\n  {\"skip\": %d, \"solved\": %s, \"iterations\": %zu, \"cost\": %.9g,\n",
                    first ? "" : ",", skip, result.path.size() >= 2 ? "true" : "false",
                    result.iterations, static_cast<double>(result.cost));
        std::printf("   \"sizes\": [%zu, %zu],\n", result.size[0], result.size[1]);
        std::printf("   \"path\": [");
        for (std::size_t i = 0; i < result.path.size(); ++i)
        {
            alignas(32) std::array<float, 8> buf{};
            result.path[i].to_array(buf.data());
            std::printf(i ? ",\n      " : "\n      ");
            print_floats(buf.data(), 7);
        }
        std::printf("]}");
        first = false;
    }
    std::printf("\n]}\n");
    return 0;
}
