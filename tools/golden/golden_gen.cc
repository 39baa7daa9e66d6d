// Golden-fixture generator: runs the *reference* implementation (header-only
// C++ from /root/reference) and dumps FK / collision / validation / sampler
// outputs as JSON for vamp_tpu's parity tests. Build & run:
//
//   g++ -O2 -march=native -std=c++17 \
//       -I /root/reference/src/impl -I tools/golden/stub \
//       tools/golden/golden_gen.cc -o /tmp/golden_gen
//   /tmp/golden_gen > tests/golden/reference.json
//
// Only fixtures (data) are committed; this driver links no reference code
// into the framework itself.

#include <array>
#include <cstdio>
#include <random>
#include <vector>

#include <vamp/vector.hh>
#include <vamp/collision/environment.hh>
#include <vamp/collision/validity.hh>
#include <vamp/planning/validate.hh>
#include <vamp/random/halton.hh>
#include <vamp/robots/panda_base.hh>
#include <vamp/robots/ur5.hh>
#include <vamp/robots/fetch.hh>
#include <vamp/robots/baxter.hh>

using namespace vamp;

static constexpr std::size_t rake = 8;
using EnvF = collision::Environment<float>;
using EnvV = collision::Environment<FloatVector<rake>>;

static void print_floats(const float *v, std::size_t n)
{
    std::printf("[");
    for (std::size_t i = 0; i < n; ++i)
        std::printf("%s%.9g", i ? "," : "", static_cast<double>(v[i]));
    std::printf("]");
}

// The sphere-cage demo environment (scripts/sphere_cage_example.py:16-31).
static EnvF sphere_cage()
{
    EnvF env;
    const float centers[14][3] = {
        {0.55, 0, 0.25},    {0.35, 0.35, 0.25}, {0, 0.55, 0.25},   {-0.55, 0, 0.25},
        {-0.35, -0.35, 0.25}, {0, -0.55, 0.25}, {0.35, -0.35, 0.25}, {0.35, 0.35, 0.8},
        {0, 0.55, 0.8},     {-0.35, 0.35, 0.8}, {-0.55, 0, 0.8},   {-0.35, -0.35, 0.8},
        {0, -0.55, 0.8},    {0.35, -0.35, 0.8}};
    for (auto &c : centers)
        env.spheres.emplace_back(collision::Sphere<float>(c[0], c[1], c[2], 0.2F));
    env.sort();
    return env;
}

// A mixed-primitive environment exercising every narrow-phase kernel.
static EnvF mixed_env()
{
    EnvF env;
    env.spheres.emplace_back(collision::Sphere<float>(0.5F, 0.1F, 0.4F, 0.15F));
    // capsule from p1=(0.2,-0.4,0.2) to p2=(0.2,-0.4,0.9), r=0.1
    {
        float xv = 0.0F, yv = 0.1F, zv = 0.7F;
        float rdv = 1.0F / (xv * xv + yv * yv + zv * zv);
        env.capsules.emplace_back(
            collision::Capsule<float>(0.2F, -0.4F, 0.2F, xv, yv, zv, 0.1F, rdv));
    }
    // z-aligned capsule
    {
        float zv = 0.5F;
        env.z_aligned_capsules.emplace_back(
            collision::Capsule<float>(-0.4F, 0.3F, 0.1F, 0.0F, 0.0F, zv, 0.08F, 1.0F / (zv * zv)));
    }
    // axis-aligned-ish cuboid rotated about z by 30 deg
    {
        float c = 0.8660254F, s = 0.5F;
        env.cuboids.emplace_back(collision::Cuboid<float>(
            0.0F, 0.6F, 0.3F,  //
            c, s, 0.0F,        //
            -s, c, 0.0F,       //
            0.0F, 0.0F, 1.0F,  //
            0.2F, 0.15F, 0.3F));
    }
    // z-aligned cuboid
    env.z_aligned_cuboids.emplace_back(collision::Cuboid<float>(
        0.6F, -0.5F, 0.2F,  //
        1.0F, 0.0F, 0.0F,   //
        0.0F, 1.0F, 0.0F,   //
        0.0F, 0.0F, 1.0F,   //
        0.25F, 0.2F, 0.2F));
    env.sort();
    return env;
}

template <typename Robot>
struct alignas(32) AlignedConfig
  : std::array<float, Robot::Configuration::num_scalars_rounded>
{
};

template <typename Robot>
static void dump_robot(const char *name, const EnvF &cage, bool first)
{
    constexpr auto dim = Robot::dimension;
    using Configuration = typename Robot::Configuration;

    std::mt19937 gen(20260817);
    std::uniform_real_distribution<float> unit(0.0F, 1.0F);

    EnvV cage_v(cage);

    std::printf("%s\"%s\": {\n", first ? "" : ",\n", name);

    // -- configs sampled in the unit cube, scaled to joint space ----------
    const int n_configs = 24;
    std::vector<AlignedConfig<Robot>> qs(n_configs);
    for (auto &q : qs)
    {
        alignas(32) std::array<float, Configuration::num_scalars_rounded> u{};
        for (std::size_t j = 0; j < dim; ++j)
            u[j] = unit(gen);
        Configuration qc(u.data());
        Robot::scale_configuration(qc);
        qc.to_array(q.data());
    }

    std::printf("  \"configs\": [");
    for (int i = 0; i < n_configs; ++i)
    {
        std::printf(i ? ",\n    " : "\n    ");
        print_floats(qs[i].data(), dim);
    }
    std::printf("],\n");

    // -- sphere FK (lane 0 of a broadcast block) --------------------------
    std::printf("  \"sphere_fk\": [");
    for (int i = 0; i < n_configs; ++i)
    {
        typename Robot::template ConfigurationBlock<rake> block;
        for (std::size_t j = 0; j < dim; ++j)
            block[j] = FloatVector<rake>::fill(qs[i][j]);
        typename Robot::template Spheres<rake> out;
        Robot::template sphere_fk<rake>(block, out);
        std::printf(i ? ",\n    [" : "\n    [");
        for (std::size_t s = 0; s < Robot::n_spheres; ++s)
        {
            float v[4] = {
                out.x[{s, 0}],
                out.y[{s, 0}],
                out.z[{s, 0}],
                out.r[{s, 0}],
            };
            std::printf("%s", s ? "," : "");
            print_floats(v, 4);
        }
        std::printf("]");
    }
    std::printf("],\n");

    // -- eefk -------------------------------------------------------------
    // Baxter's generated eefk is an empty body returning garbage (reference
    // quirk, robots/baxter/fk.hh tail; cf. SURVEY §7) — emit nulls for it.
    std::printf("  \"eefk\": [");
    for (int i = 0; i < n_configs; ++i)
    {
        std::printf(i ? ",\n    " : "\n    ");
        if constexpr (dim == 14)
        {
            std::printf("null");
        }
        else
        {
            std::array<float, dim> qa{};
            std::copy_n(qs[i].begin(), dim, qa.begin());
            auto pose = Robot::eefk(qa);
            print_floats(pose.data(), 7);
        }
    }
    std::printf("],\n");

    // -- fkcc (valid = collision-free incl. self-collision) on empty env --
    EnvF empty_f;
    EnvV empty_v(empty_f);
    std::printf("  \"fkcc_empty\": [");
    for (int i = 0; i < n_configs; ++i)
    {
        typename Robot::template ConfigurationBlock<rake> block;
        for (std::size_t j = 0; j < dim; ++j)
            block[j] = FloatVector<rake>::fill(qs[i][j]);
        bool valid = Robot::template fkcc<rake>(empty_v, block);
        std::printf("%s%s", i ? "," : "", valid ? "true" : "false");
    }
    std::printf("],\n");

    // -- fkcc on the sphere cage ------------------------------------------
    std::printf("  \"fkcc_cage\": [");
    for (int i = 0; i < n_configs; ++i)
    {
        typename Robot::template ConfigurationBlock<rake> block;
        for (std::size_t j = 0; j < dim; ++j)
            block[j] = FloatVector<rake>::fill(qs[i][j]);
        bool valid = Robot::template fkcc<rake>(cage_v, block);
        std::printf("%s%s", i ? "," : "", valid ? "true" : "false");
    }
    std::printf("],\n");

    // -- validate_motion between consecutive configs on the cage ----------
    std::printf("  \"validate_cage\": [");
    for (int i = 0; i + 1 < n_configs; ++i)
    {
        Configuration a(qs[i].data());
        Configuration b(qs[i + 1].data());
        bool valid = planning::validate_motion<Robot, rake, Robot::resolution>(a, b, cage_v);
        std::printf("%s%s", i ? "," : "", valid ? "true" : "false");
    }
    std::printf("]\n}");
}

int main()
{
    auto cage = sphere_cage();
    auto mixed = mixed_env();

    std::printf("{\n");

    dump_robot<robots::PandaBase<0, 0, 0>>("panda", cage, true);
    dump_robot<robots::PandaBase<200, 200, 0>>("panda_2_2", cage, false);
    dump_robot<robots::UR5>("ur5", cage, false);
    dump_robot<robots::Fetch>("fetch", cage, false);
    dump_robot<robots::Baxter>("baxter", cage, false);

    // -- primitive collision checks: single spheres vs. the mixed env -----
    {
        EnvV mixed_v(mixed);
        std::mt19937 gen(7);
        std::uniform_real_distribution<float> u(-1.0F, 1.2F);
        std::printf(",\n\"mixed_env_points\": [");
        for (int i = 0; i < 256; ++i)
        {
            float x = u(gen), y = u(gen), z = std::abs(u(gen));
            float r = 0.02F + 0.08F * std::abs(u(gen));
            bool hit = sphere_environment_in_collision(
                mixed_v, FloatVector<rake>::fill(x), FloatVector<rake>::fill(y),
                FloatVector<rake>::fill(z), FloatVector<rake>::fill(r));
            std::printf("%s\n    [%.9g,%.9g,%.9g,%.9g,%s]", i ? "," : "", x, y, z, r,
                        hit ? "true" : "false");
        }
        std::printf("],\n");
    }

    // -- heightfield narrow phase (sphere_heightfield.hh:9-30) -------------
    {
        // 16x16 sinusoidal height image. Queries stay strictly in-bounds:
        // the reference clamps the float index to [0, xd] and floors, so a
        // saturated coordinate reads data[...xd] — out of bounds (vamp_tpu
        // clamps to xd-1 instead; see ops/fkcc_bm.py).
        constexpr std::size_t xd = 16, yd = 16;
        std::vector<float> hdata(xd * yd);
        for (std::size_t iy = 0; iy < yd; ++iy)
            for (std::size_t ix = 0; ix < xd; ++ix)
                hdata[iy * xd + ix] = 0.1F * std::sin(0.7F * static_cast<float>(ix)) *
                                          std::cos(0.5F * static_cast<float>(iy)) +
                                      0.05F * static_cast<float>(ix) / 16.0F;
        EnvF henv;
        henv.heightfields.emplace_back(collision::HeightField<float>(
            0.0F, 0.0F, 0.0F, 8.0F, 8.0F, 1.0F, xd, yd, hdata));
        henv.sort();
        EnvV henv_v(henv);
        std::mt19937 gen(11);
        std::uniform_real_distribution<float> u(-0.8F, 0.8F);
        std::uniform_real_distribution<float> uz(-0.3F, 0.5F);
        std::printf("\"heightfield_points\": [");
        for (int i = 0; i < 256; ++i)
        {
            float x = u(gen), y = u(gen), z = uz(gen);
            float r = 0.02F + 0.05F * std::abs(u(gen));
            bool hit = sphere_environment_in_collision(
                henv_v, FloatVector<rake>::fill(x), FloatVector<rake>::fill(y),
                FloatVector<rake>::fill(z), FloatVector<rake>::fill(r));
            std::printf("%s\n    [%.9g,%.9g,%.9g,%.9g,%s]", i ? "," : "", x, y, z, r,
                        hit ? "true" : "false");
        }
        std::printf("],\n");
    }

    // -- Halton sequences --------------------------------------------------
    {
        std::printf("\"halton7\": [");
        rng::Halton<7> h;
        for (int i = 0; i < 128; ++i)
        {
            auto v = h.next();
            alignas(32) std::array<float, 8> a{};
            v.to_array(a.data());
            std::printf(i ? ",\n    " : "\n    ");
            print_floats(a.data(), 7);
        }
        std::printf("],\n");
        std::printf("\"halton14\": [");
        rng::Halton<14> h14;
        for (int i = 0; i < 32; ++i)
        {
            auto v = h14.next();
            alignas(32) std::array<float, 16> a{};
            v.to_array(a.data());
            std::printf(i ? ",\n    " : "\n    ");
            print_floats(a.data(), 14);
        }
        std::printf("]\n");
    }

    std::printf("}\n");
    return 0;
}
